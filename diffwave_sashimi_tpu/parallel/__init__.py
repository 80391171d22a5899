from .mesh import (make_mesh, mesh_from_cfg, batch_sharding, replicated,
                   shard_batch)
