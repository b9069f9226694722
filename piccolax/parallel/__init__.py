from .mesh import batch_solve, get_mesh, shard_batch
