#!/usr/bin/env bash
# Train the Conformer-M CTC+RNN-T recipe (reference train.sh equivalent).
set -euo pipefail
cd "$(dirname "$0")/.."

CONFIG=${CONFIG:-configs/conformer_m.json}
CKPT_DIR=${CKPT_DIR:-experiments/conformer-m-rnnt-ctc}
mkdir -p "$CKPT_DIR"
cp "$CONFIG" "$CKPT_DIR/"

python -m conformer_tpu.main \
    --config "$CONFIG" \
    --set train.checkpoint_dir="$CKPT_DIR" \
    --train \
    "$@"
