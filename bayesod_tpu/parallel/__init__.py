"""Mesh + sharding layouts for data/sample parallelism (SURVEY.md §5.8)."""

from bayesod_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_state,
    replicated,
    sample_sharding,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "replicate_state",
    "replicated",
    "sample_sharding",
    "shard_batch",
]
