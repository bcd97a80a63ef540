from .mesh import batch_sharding, make_mesh, replicated_sharding, shard_batch

__all__ = ['make_mesh', 'batch_sharding', 'replicated_sharding', 'shard_batch']
