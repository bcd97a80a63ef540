from .mesh import batch_sharding, make_mesh, replicated_sharding, shard_batch
from .tp import model_axis_spec, shard_state, state_shardings

__all__ = ['make_mesh', 'batch_sharding', 'replicated_sharding',
           'shard_batch', 'model_axis_spec', 'state_shardings',
           'shard_state']
