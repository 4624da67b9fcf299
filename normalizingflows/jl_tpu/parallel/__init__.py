"""Multi-chip execution: mesh construction, batch-sharded objectives and
sampling, per-shard PRNG, and multi-host initialization."""

from .distributed import (
    barrier,
    detect_cluster_env,
    host_count,
    host_index,
    initialize,
    is_multi_host,
)
from .mesh import (
    BATCH_AXIS,
    batch_mesh,
    batch_sharding,
    replicated_sharding,
)
from .sharded import per_shard_key, sample_sharded, shard_objective

__all__ = [
    "BATCH_AXIS",
    "batch_mesh",
    "batch_sharding",
    "replicated_sharding",
    "per_shard_key",
    "sample_sharded",
    "shard_objective",
    "initialize",
    "is_multi_host",
    "barrier",
    "detect_cluster_env",
    "host_count",
    "host_index",
]
