#!/usr/bin/env bash
# Evaluate (WER on the test list) with the latest checkpoint.
set -euo pipefail
cd "$(dirname "$0")/.."

CONFIG=${CONFIG:-configs/conformer_m.json}
CKPT_DIR=${CKPT_DIR:-experiments/conformer-m-rnnt-ctc}

python -m conformer_tpu.main \
    --config "$CONFIG" \
    --set train.checkpoint_dir="$CKPT_DIR" \
    --eval --resume --resume_from "$CKPT_DIR" \
    "$@"
