from .mesh import (make_mesh, mesh_from_cfg, batch_sharding,
                   is_main_process, replicated, shard_batch)
