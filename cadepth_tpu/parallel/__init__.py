from cadepth_tpu.parallel.distributed import initialize_distributed
from cadepth_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    image_sharding,
    batch_shardings,
    batch_sharding,
    replicate_sharding,
    shard_batch,
    replicate_state,
)

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "make_mesh_2d",
    "image_sharding",
    "batch_shardings",
    "batch_sharding",
    "replicate_sharding",
    "shard_batch",
    "replicate_state",
]
