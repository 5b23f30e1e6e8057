from dpr_scale_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    replicated,
    shard_batch,
)

__all__ = ["get_mesh", "batch_sharding", "replicated", "shard_batch"]
