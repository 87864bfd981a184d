from .mesh import make_mesh, best_mesh_shape
from .sharding import (
    data_sharding,
    fsdp_param_sharding,
    replicated,
    shard_batch,
)
