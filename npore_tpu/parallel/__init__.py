from .mesh import make_data_mesh, make_sharded_step, shard_batch
