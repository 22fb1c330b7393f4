from gvl_tpu.parallel.mesh import (make_mesh, make_mesh_for_batch,  # noqa: F401
                                   shard_batch, replicate_tree,
                                   batch_sharding)
