from slak_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
from slak_tpu.parallel.tp import make_tp_apply

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "replicate", "make_tp_apply"]
