"""Minimal repro for the pruned-loss b>=48 compile failure (VERDICT r4 #5).

Round 4's pruned train-step sweep died at batch 48 with HTTP 500 from the
remote TPU compile helper (three runs, also at band t_chunk=64); b<=32
compiles and runs. This script isolates the failing unit so the cause can
be bisected:

  phase "loss":  jit(value_and_grad(pruned loss)) alone at Conformer-M
                 shapes — no encoder/predictor, the smallest program
                 containing the band joint + simple lattice.
  phase "step":  the full train step (what the bench compiles).

and sweeps batch / t_chunk / s_range. On CPU (--cpu) the same program is
lowered and compiled through XLA:CPU, proving the HLO itself is valid and
bounded — i.e. that a TPU-side failure is a compile-service limit, not a
malformed program.

Usage:
  python scripts/repro_pruned_b48.py --phase loss --batches 32,48
  JAX_PLATFORMS=cpu python scripts/repro_pruned_b48.py --cpu --phase loss \
      --batches 48
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["loss", "step"], default="loss")
    ap.add_argument("--batches", default="32,48")
    ap.add_argument("--t-chunk", type=int, default=128)
    ap.add_argument("--s-range", type=int, default=5)
    ap.add_argument("--t", type=int, default=374, help="subsampled frames")
    ap.add_argument("--u", type=int, default=100, help="label length")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--run", action="store_true",
                    help="also execute one step after compiling")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from conformer_tpu.config import Config

    cfg = Config().model  # Conformer-M defaults
    cfg.use_pruned_loss = True
    cfg.rnnt_t_chunk = args.t_chunk
    cfg.prune_range = args.s_range
    v, j = cfg.vocab_size, cfg.join_dim

    for bs in [int(x) for x in args.batches.split(",")]:
        t0 = time.time()
        try:
            if args.phase == "loss":
                from conformer_tpu.ops.rnnt_pruned import (
                    rnnt_loss_pruned_full,
                )

                def loss_fn(am, lm, enc_proj, pred_proj, w_out, b_out,
                            labels, t_len, u_len):
                    simple, pruned = rnnt_loss_pruned_full(
                        am, lm, enc_proj, pred_proj, w_out, b_out, labels,
                        t_len, u_len, s_range=args.s_range,
                        t_chunk=args.t_chunk, simple_impl="pallas",
                    )
                    return jnp.mean(0.5 * simple + pruned)

                shapes = (
                    jax.ShapeDtypeStruct((bs, args.t, v), jnp.float32),
                    jax.ShapeDtypeStruct((bs, args.u + 1, v), jnp.float32),
                    jax.ShapeDtypeStruct((bs, args.t, j), jnp.float32),
                    jax.ShapeDtypeStruct((bs, args.u + 1, j), jnp.float32),
                    jax.ShapeDtypeStruct((j, v), jnp.float32),
                    jax.ShapeDtypeStruct((v,), jnp.float32),
                    jax.ShapeDtypeStruct((bs, args.u), jnp.int32),
                    jax.ShapeDtypeStruct((bs,), jnp.int32),
                    jax.ShapeDtypeStruct((bs,), jnp.int32),
                )
                f = jax.jit(jax.grad(loss_fn, argnums=(2, 3, 4)))
                lowered = f.lower(*shapes)
                hlo_bytes = len(lowered.as_text())
                compiled = lowered.compile()
            else:
                from conformer_tpu.train.loop import Trainer

                c = Config()
                c.model.use_pruned_loss = True
                c.model.rnnt_t_chunk = args.t_chunk
                c.model.prune_range = args.s_range
                c.train.mesh_data = 1
                c.train.accum_grad = 1
                trainer = Trainer(c)
                import numpy as np

                frames = args.t * 4 + 7
                rng = np.random.default_rng(0)
                batch = {
                    "feats": rng.standard_normal(
                        (bs, frames, 80)
                    ).astype(np.float32),
                    "feat_lengths": np.full((bs,), frames, np.int32),
                    "labels": rng.integers(
                        1, v, (bs, args.u)
                    ).astype(np.int32),
                    "label_lengths": np.full((bs,), args.u, np.int32),
                }
                trainer.train_step([batch])   # compile + one step
                hlo_bytes, compiled = 0, None
            dt = time.time() - t0
            mem = getattr(compiled, "memory_analysis", lambda: None)()
            peak = getattr(mem, "temp_size_in_bytes", None) if mem else None
            print(
                f"b={bs} t_chunk={args.t_chunk} s_range={args.s_range} "
                f"phase={args.phase}: COMPILED in {dt:.1f}s "
                f"(hlo {hlo_bytes/1e6:.1f} MB"
                + (f", temp {peak/1e9:.2f} GB" if peak else "")
                + ")",
                flush=True,
            )
            if args.run and args.phase == "loss":
                import numpy as np

                rng = np.random.default_rng(0)
                vals = [
                    jnp.asarray(rng.standard_normal(s.shape, np.float32) * 0.1)
                    if s.dtype == jnp.float32
                    else jnp.asarray(
                        rng.integers(1, 50, s.shape).astype(np.int32)
                    )
                    for s in shapes
                ]
                vals[-2] = jnp.full((bs,), args.t, jnp.int32)
                vals[-1] = jnp.full((bs,), args.u, jnp.int32)
                out = compiled(*vals)
                jax.block_until_ready(out)
                print(f"b={bs}: RAN ok", flush=True)
        except Exception as e:  # noqa: BLE001 — the repro IS the error report
            dt = time.time() - t0
            print(
                f"b={bs} t_chunk={args.t_chunk} s_range={args.s_range} "
                f"phase={args.phase}: FAILED after {dt:.1f}s: "
                f"{type(e).__name__}: {str(e)[:500]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
