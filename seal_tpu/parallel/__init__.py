from .mesh import (
    HEMesh,
    make_mesh,
    shard_batch,
    shard_kswitch_key,
    replicate,
)
from .batch import BatchEvaluator
