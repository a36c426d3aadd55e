"""Roofline measurement for the full-lattice MFU ceiling (VERDICT r4 #6).

Question: is 0.30 step MFU physically reachable at Conformer-M
(J=512, V=5002) with the full-lattice loss, or is the measured ~0.25-0.26
the roofline? Decompose the step:

  t_step      = measured full train step (bench.py headline)
  t_loss      = measured joint+lattice loss fwd+bwd alone
                (rnnt_loss_fused grad over enc_proj/pred_proj/W/b)
  t_loss_sol  = MXU speed-of-light for the loss's matmul FLOPs: time an
                actual [M, J] x [J, V] dot chain of the same total FLOPs
                (fwd + dx + dW + remat recompute = 4x the forward matmul),
                i.e. what a PERFECT logsumexp-in-matmul epilogue kernel
                (zero VPU/HBM cost) could possibly achieve.

Then  MFU_bound = analytic_step_flops / peak / (t_step - t_loss + t_loss_sol)

If MFU_bound < 0.30, no joint-kernel engineering can reach 0.30 and the
lever is closed with a measurement; if > 0.30, the epilogue kernel is
worth building. Also times the existing fused Pallas joint kernel
(ops/pallas/joint_kernel.py) against the XLA chunk map at the same shapes.

Run ON TPU (one process!):  python scripts/roofline_joint.py --batch 24
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *a, iters=8, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*a)
    jax.block_until_ready(out)
    # one scalar fetch after the full enqueue chain (axon sync rule)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    leaves = jax.tree_util.tree_leaves(out)
    float(leaves[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--t", type=int, default=374)
    ap.add_argument("--u", type=int, default=100)
    ap.add_argument("--t-chunk", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-step", action="store_true",
                    help="skip the full-train-step measurement (slow compile)")
    ap.add_argument("--sol-only", action="store_true",
                    help="only the matmul speed-of-light measurement")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from conformer_tpu.config import Config

    cfg = Config().model
    b, t, u1 = args.batch, args.t, args.u + 1
    j, v = cfg.join_dim, cfg.vocab_size
    rng = np.random.default_rng(0)

    enc_proj = jnp.asarray(rng.standard_normal((b, t, j)).astype(np.float32) * 0.1)
    pred_proj = jnp.asarray(rng.standard_normal((b, u1, j)).astype(np.float32) * 0.1)
    w_out = jnp.asarray(rng.standard_normal((j, v)).astype(np.float32) * 0.02)
    b_out = jnp.zeros((v,), jnp.float32)
    labels = jnp.asarray(rng.integers(1, v, (b, args.u)).astype(np.int32))
    t_len = jnp.full((b,), t, jnp.int32)
    u_len = jnp.full((b,), args.u, jnp.int32)

    from conformer_tpu.ops.rnnt import rnnt_loss_fused

    results = {"batch": b, "t": t, "u1": u1, "j": j, "v": v}

    # ---- measured loss fwd+bwd: XLA chunk map and Pallas fused kernel ----
    loss_impls = [] if args.sol_only else [
        ("xla_chunk", "xla"), ("pallas_fused", "pallas")
    ]
    for name, joint_impl in loss_impls:
        f = jax.jit(
            jax.grad(
                lambda e, p, w, bb: rnnt_loss_fused(
                    e, p, w, bb, labels, t_len, u_len,
                    t_chunk=args.t_chunk, joint_impl=joint_impl,
                ),
                argnums=(0, 1, 2, 3),
            )
        )
        try:
            dt = timeit(f, enc_proj, pred_proj, w_out, b_out)
            results[f"loss_{name}_ms"] = round(dt * 1e3, 1)
            print(f"loss fwd+bwd [{name}]: {dt*1e3:.1f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            results[f"loss_{name}_error"] = f"{type(e).__name__}: {str(e)[:200]}"
            print(f"loss fwd+bwd [{name}] FAILED: {e}", flush=True)

    # ---- MXU speed-of-light for the same matmul FLOPs -------------------
    # The loss's MXU work per step: forward logits matmul [M, J] x [J, V]
    # plus backward dx ([M,V] x [V,J]), dW ([J,M] x [M,V]) and the remat
    # forward replay — 4 matmuls of 2*M*J*V FLOPs each. Time real dots of
    # a VMEM-friendly tile (bf16, the dtype a purpose-built epilogue
    # kernel would use) and scale to the full row count — the optimistic
    # bound: zero VPU/HBM epilogue cost.
    m_total = b * t * u1
    m_tile = 32768
    x = jnp.asarray(
        rng.standard_normal((m_tile, j)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    dl = jnp.asarray(
        rng.standard_normal((m_tile, v)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    w_bf = w_out.astype(jnp.bfloat16)

    reps = 32  # repetitions INSIDE one jit call: a ~3 ms op cannot be
    # timed per-dispatch over the ~30 ms axon tunnel RTT

    @jax.jit
    def sol_chain(x, w, dl):
        # fwd + remat replay: two [M,J]x[J,V]; dx: [M,V]x[V,J]^T; dW:
        # x^T dl. The carry feeds back into x so XLA cannot hoist or
        # elide iterations.
        def body(i, carry):
            s, xx = carry
            a = jnp.sum(xx @ w)
            a2 = jnp.sum(xx @ w)
            dx = jnp.sum(dl @ w.T)
            dw = jnp.sum(xx.T @ dl)
            s = s + a + a2 + dx + dw
            xx = xx + (s * 1e-20).astype(xx.dtype)
            return s, xx

        s, _ = jax.lax.fori_loop(
            0, reps, body, (jnp.zeros((), jnp.float32), x)
        )
        return s

    dt_call = timeit(sol_chain, x, w_bf, dl, iters=4)
    dt_tile = dt_call / reps
    sol = dt_tile * (m_total / m_tile)
    del x, dl, w_bf
    results["loss_matmul_sol_ms"] = round(sol * 1e3, 1)
    flops_loss = 4 * 2.0 * m_total * j * v
    results["loss_matmul_tflop"] = round(flops_loss / 1e12, 2)
    print(
        f"matmul speed-of-light for loss FLOPs: {sol*1e3:.1f} ms "
        f"({flops_loss/1e12:.1f} TFLOP -> {flops_loss/sol/1e12:.0f} TFLOP/s)",
        flush=True,
    )

    # ---- full train step ------------------------------------------------
    if not args.skip_step and not args.sol_only:
        from conformer_tpu.models.transducer import init_transducer
        from conformer_tpu.train.flops import transducer_step_flops
        from conformer_tpu.train.loop import Trainer

        c = Config()
        c.model.use_pruned_loss = False
        c.model.rnnt_t_chunk = args.t_chunk
        c.train.mesh_data = 1
        c.train.accum_grad = 1
        trainer = Trainer(c)
        frames = t * 4 + 7
        batch = {
            "feats": np.asarray(
                rng.standard_normal((b, frames, 80)), np.float32
            ),
            "feat_lengths": np.full((b,), frames, np.int32),
            "labels": np.asarray(labels),
            "label_lengths": np.asarray(u_len),
        }
        trainer.train_step([batch])  # compile
        t0 = time.perf_counter()
        iters = 6
        for _ in range(iters):
            m = trainer.train_step([batch])
        dt_step = (time.perf_counter() - t0) / iters
        results["step_ms"] = round(dt_step * 1e3, 1)
        fl = transducer_step_flops(c.model, b, frames, args.u, fwd_bwd=True)
        results["step_tflop_analytic"] = round(fl["total"] / 1e12, 2)
        loss_ms = results.get("loss_xla_chunk_ms", 0.0)
        bound_ms = results["step_ms"] - loss_ms + results["loss_matmul_sol_ms"]
        peak = 197e12  # v5e bf16; adjust per device_kind if needed
        results["device_kind"] = jax.devices()[0].device_kind
        results["mfu_measured"] = round(
            fl["total"] / (dt_step * peak), 4
        )
        results["mfu_bound_perfect_joint"] = round(
            fl["total"] / (bound_ms / 1e3 * peak), 4
        )
        print(json.dumps(results, indent=1))
    else:
        print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
