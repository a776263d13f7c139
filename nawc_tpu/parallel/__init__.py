from .mesh import make_mesh, data_sharding, replicate_sharding, shard_batch
from .tp import tp_nearest_codebook
from .eval import make_sharded_eval

__all__ = [
    "make_mesh", "data_sharding", "replicate_sharding", "shard_batch",
    "tp_nearest_codebook", "make_sharded_eval",
]
