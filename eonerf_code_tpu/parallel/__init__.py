"""Device meshes and sharding for multi-chip training."""

from eonerf_code_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_sharding,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "data_sharding"]
