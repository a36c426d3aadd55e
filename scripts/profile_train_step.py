"""Component-level time breakdown of the Conformer-M train step.

Times the full fwd+bwd train step and isolated sub-paths (encoder only,
XLA-vs-Pallas kernels, per-loss-branch) at flagship shapes on whatever
device JAX picks (intended for the real TPU). Used to produce the
docs/PERF.md breakdown; the reference never ships anything comparable
(its training loop is Lightning-internal, reference src/module.py:49-69).

Usage:  python scripts/profile_train_step.py [--batch 32] [--secs 15]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from __graft_entry__ import _flagship_cfg  # noqa: E402
from conformer_tpu.models.encoder import encoder_forward  # noqa: E402
from conformer_tpu.models.transducer import (  # noqa: E402
    init_transducer,
    transducer_forward,
)


def _timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--secs", type=float, default=15.0)
    ap.add_argument("--u", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    b, frames, u = args.batch, int(args.secs * 100), args.u
    base = dataclasses.replace(
        _flagship_cfg(),
        use_pallas_attention=True,
        use_pallas_rnnt=True,
        use_pallas_ctc=True,
    )
    feats = jax.random.normal(jax.random.PRNGKey(1), (b, frames, base.input_dim))
    flens = jnp.full((b,), frames, jnp.int32)
    labels = jax.random.randint(
        jax.random.PRNGKey(2), (b, args.u), 1, base.vocab_size - 1
    )
    llens = jnp.full((b,), u, jnp.int32)
    rng = jax.random.PRNGKey(3)

    def full_step(cfg, det=False):
        params = init_transducer(jax.random.PRNGKey(0), cfg)

        @jax.jit
        def f(p, r):
            def loss_fn(p):
                return transducer_forward(
                    p, feats, flens, labels, llens, cfg,
                    rng=None if det else r, deterministic=det,
                )["loss"]

            loss, grads = jax.value_and_grad(loss_fn)(p)
            gn = sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads))
            return loss + 0.0 * gn

        return _timeit(f, params, rng, n=args.iters)

    def encoder_step(cfg):
        params = init_transducer(jax.random.PRNGKey(0), cfg)

        @jax.jit
        def f(p, r):
            def loss_fn(p):
                out, mask = encoder_forward(
                    p["encoder"], feats, flens, cfg, cmvn=p.get("cmvn"),
                    rng=r, deterministic=False,
                )
                return jnp.sum(jnp.where(mask[..., None], out, 0.0) ** 2) * 1e-6

            loss, grads = jax.value_and_grad(loss_fn)(p)
            gn = sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads))
            return loss + 0.0 * gn

        return _timeit(f, params, rng, n=args.iters)

    rows = [
        ("full_step (pallas attn+rnnt+ctc)", lambda: full_step(base)),
        ("full_step deterministic", lambda: full_step(base, det=True)),
        ("encoder only fwd+bwd", lambda: encoder_step(base)),
        ("encoder w/ XLA attention",
         lambda: encoder_step(
             dataclasses.replace(base, use_pallas_attention=False))),
        ("full_step w/ XLA rnnt loss",
         lambda: full_step(dataclasses.replace(base, use_pallas_rnnt=False))),
        ("full_step w/ XLA ctc loss",
         lambda: full_step(dataclasses.replace(base, use_pallas_ctc=False))),
        ("full_step no ctc branch",
         lambda: full_step(dataclasses.replace(base, ctc_weight=0.0))),
        ("full_step pruned rnnt",
         lambda: full_step(dataclasses.replace(base, use_pruned_loss=True))),
    ]
    print(f"# device={jax.devices()[0].device_kind} "
          f"b={b} frames={frames} u={u}")
    for name, f in rows:
        try:
            print(f"{name:36s} {f():8.1f} ms", flush=True)
        except Exception as e:  # OOM etc. — keep profiling the rest
            print(f"{name:36s} {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
