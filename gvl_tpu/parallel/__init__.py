from gvl_tpu.parallel.mesh import (make_mesh, shard_batch,  # noqa: F401
                                   replicate_tree, batch_sharding)
