"""Mesh + sharding: GSPMD data/model parallelism (SURVEY.md §2.2)."""

from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    replicated,
    shard_batch,
    shard_params,
)
