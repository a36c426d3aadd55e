"""Mesh + sharding: GSPMD data/model parallelism (SURVEY.md §2.2) and
multi-host runtime (jax.distributed init + cross-process reductions)."""

from .distributed import (  # noqa: F401
    allsum_host_scalars,
    barrier,
    gather_tree_to_host,
    is_multiprocess,
    maybe_initialize_distributed,
)
from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    replicated,
    shard_batch,
    shard_params,
)
