"""CLI entry point: train / eval / decode.

Replaces the reference's argparse sprawl (src/main.py:5-69) with a JSON
config + dotted overrides:

    python -m conformer_tpu.main --config configs/conformer_m.json --train \
        --set train.checkpoint_dir=experiments/run1 model.encoder_num_layers=12

    python -m conformer_tpu.main --config ... --eval --resume_from last
"""

from __future__ import annotations

import argparse
import sys

from .config import Config


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="conformer_tpu",
        description="TPU-native Conformer CTC/RNN-T ASR framework",
    )
    ap.add_argument("--config", type=str, default=None, help="JSON config file")
    ap.add_argument(
        "--set", nargs="*", default=[], metavar="SECTION.KEY=VALUE",
        help="dotted config overrides",
    )
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--streaming_eval", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--resume_from", type=str, default=None)
    ap.add_argument("--wenet_ckpt_path", type=str, default=None)
    ap.add_argument("--wandb", action="store_true")
    ap.add_argument("--print_config", action="store_true")
    # Multi-host execution (replaces Lightning DDP spawn, reference
    # src/executor.py:137-139): run this same command on every host with
    # its own --process_id; or rely on CONFORMER_* env vars / TPU-pod
    # auto-detection (CONFORMER_DISTRIBUTED=auto).
    ap.add_argument(
        "--coordinator", type=str, default=None,
        help="host:port of process 0 for jax.distributed.initialize",
    )
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_argparser().parse_args(argv)

    from .parallel import maybe_initialize_distributed

    # Must run before any JAX device use so jax.devices() spans the slice.
    maybe_initialize_distributed(
        coordinator=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    cfg = Config.from_json_file(args.config) if args.config else Config()
    if args.set:
        cfg = cfg.apply_overrides(args.set)
    if args.resume_from:
        cfg.train.resume_from = args.resume_from
    if args.streaming_eval:
        cfg.decode.streaming = True
    if args.print_config:
        print(cfg.to_json())
        return 0

    from .train.loop import Trainer

    trainer = Trainer(cfg, use_wandb=args.wandb)
    if args.wenet_ckpt_path:
        trainer.load_torch_checkpoint(args.wenet_ckpt_path)

    if args.train:
        trainer.install_preemption_handler()
        trainer.fit()
    if args.eval:
        if args.resume and cfg.train.resume_from:
            trainer.restore(cfg.train.resume_from)
        from .data.dataset import AsrDataset, eval_config

        ds = AsrDataset(
            eval_config(cfg.data), mode="test", tokenizer=trainer.tokenizer
        )
        wer = trainer.validate(ds)
        print(f"WER: {wer:.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
