"""Multi-host runtime: jax.distributed initialization + cross-process
reductions.

The reference trains multi-device out of the box through Lightning DDP
(/root/reference/src/executor.py:137-139 spawns one NCCL rank per GPU) and
all_gathers validation predictions before computing WER
(/root/reference/src/module.py:87-96). The TPU-native equivalent is
single-controller-per-host JAX:

  - every host runs the same program and calls
    `jax.distributed.initialize(coordinator, num_processes, process_id)`;
    after that `jax.devices()` spans the whole slice and GSPMD inserts the
    gradient all-reduce over ICI/DCN exactly as in the single-host case —
    no other code changes;
  - the data pipeline already shards per host
    (data/dataset.py keyed by jax.process_index());
  - host-side quantities (WER counts, losses for logging) are summed across
    processes with multihost_utils.process_allgather (the direct replacement
    for the reference's `self.all_gather` + `sync_dist=True`).

Configuration is flag- or environment-driven:
  CONFORMER_COORDINATOR   host:port of process 0
  CONFORMER_NUM_PROCESSES total process count
  CONFORMER_PROCESS_ID    this process's rank
  CONFORMER_DISTRIBUTED=auto  use jax.distributed auto-detection (TPU pods:
      the TPU metadata server provides coordinator/rank, so bare
      `jax.distributed.initialize()` works)
On CPU (tests / sandboxes), collectives run over gloo.
"""

from __future__ import annotations

import os

import jax
import numpy as np

_INITIALIZED = False


def maybe_initialize_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed if multi-host execution is configured.

    Returns True if the distributed runtime was (or already had been)
    initialized; False for plain single-process runs. Safe to call twice.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True

    coordinator = coordinator or os.environ.get("CONFORMER_COORDINATOR")
    env_n = os.environ.get("CONFORMER_NUM_PROCESSES")
    env_id = os.environ.get("CONFORMER_PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (
        int(env_n) if env_n else None
    )
    process_id = process_id if process_id is not None else (
        int(env_id) if env_id else None
    )
    auto = os.environ.get("CONFORMER_DISTRIBUTED", "").lower() in ("auto", "1")

    if coordinator is None and not auto:
        return False

    # CPU cross-process collectives need gloo (tests, sandboxes). Checked
    # via env, NOT jax.default_backend() — that call would initialize the
    # XLA backend and make jax.distributed.initialize() fail.
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        try:
            # Pin the platform through jax.config as well: with only the
            # env var set, jax.distributed.initialize can still bring up a
            # discovered accelerator plugin, collapsing the virtual
            # --xla_force_host_platform_device_count=N CPU mesh to the
            # plugin's device count.
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # pragma: no cover - older jax spells it differently
            pass

    if coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:  # auto: TPU pod metadata provides everything
        jax.distributed.initialize()
    _INITIALIZED = True
    return True


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def allsum_host_scalars(values: dict[str, float]) -> dict[str, float]:
    """Sum a dict of host-side Python scalars across all processes.

    The replacement for the reference's validation `all_gather`
    (src/module.py:87-88): WER error/word counts (and any logged loss) are
    summed so every process — in particular the checkpoint-writing process
    0 — sees the global value. Single-process: returns the input unchanged.
    """
    if jax.process_count() == 1:
        return dict(values)
    from jax.experimental import multihost_utils

    keys = sorted(values)
    local = np.asarray([float(values[k]) for k in keys], np.float64)
    gathered = multihost_utils.process_allgather(local)  # [P, K]
    summed = np.asarray(gathered).sum(axis=0)
    return {k: float(v) for k, v in zip(keys, summed)}


def gather_tree_to_host(tree, mesh):
    """Materialize a (possibly cross-host-sharded) array pytree as plain
    host NumPy arrays on every process.

    Used for (a) process-0 checkpoint writes and (b) host-local validation
    decode in multi-process runs: a jitted identity with replicated
    out_shardings performs the all-gather over ICI/DCN (every process must
    call this — it is a collective), after which each process holds a fully
    addressable replica. Single-process: plain device_get.
    """
    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(mesh, PartitionSpec())
    gathered = jax.jit(
        lambda t: t,
        out_shardings=jax.tree.map(lambda _: rep, tree),
    )(tree)
    return jax.tree.map(
        lambda x: np.asarray(x.addressable_shards[0].data), gathered
    )


def barrier(name: str = "barrier") -> None:
    """Cross-process sync point (reference trainer.strategy.barrier(),
    src/module.py:96). No-op single-process."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
