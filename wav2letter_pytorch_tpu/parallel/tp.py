"""Tensor (model) parallelism: channel-sharded parameters over a 2-D mesh.

The reference has no model parallelism at all (SURVEY.md §2.3 — its only
scaling story is Lightning DDP). Here tensor parallelism is a *sharding
annotation*, not a code path: the training step is written once against
global arrays, a second ``model`` mesh axis is added next to ``data``, and
conv weights are sharded on their output-channel dimension. The XLA SPMD
partitioner propagates the layout through the network — activations become
channel-sharded after every conv, BatchNorm reduces over (B, T) so its
per-channel statistics stay local to each shard (no collective), and the
partitioner inserts the (ICI-riding) all-gathers/reduce-scatters where
layouts meet, e.g. where a channel-sharded activation feeds the next conv's
contraction.

For this model family (wide 1-D convs, 256-1024 channels) TP is a memory
lever more than a speed lever: a data-axis replica holds weights + NovoGrad
state / ``model`` shards, so a model too big for one chip's HBM trains by
trading a few activation all-gathers. The rule below is deliberately
shape-driven rather than name-driven so it covers params, BN running
stats, and every optax state leaf that mirrors a param (momenta, nu, ...)
with one function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = 'model'


def model_axis_spec(leaf, model_size: int) -> P:
    """PartitionSpec for one state leaf: shard the trailing (channel) dim
    over the ``model`` axis when it is evenly divisible and plausibly a
    channel dimension.

    Eligibility rules (each excludes a concrete non-channel leaf):
    * floating dtype only — excludes RNG keys (uint32 pairs), step counters
      and optax ``count`` scalars;
    * trailing dim divisible by ``model_size`` — excludes the 29-label CTC
      head kernel/bias, which stays replicated (it is tiny);
    * trailing dim >= 8 * model_size — a shard should keep a lane-width of
      channels; excludes small oddballs without hardcoding names.

    Conv kernels (K, Cin, Cout) shard Cout; depthwise kernels (K, 1, C)
    shard C; biases / BN scale / BN running stats (C,) shard C — so a
    layer's whole parameter group lives on the same shard and BatchNorm
    needs no cross-shard traffic.
    """
    shape = getattr(leaf, 'shape', None)
    dtype = getattr(leaf, 'dtype', None)
    if (model_size <= 1 or shape is None or len(shape) == 0
            or dtype is None or not jnp.issubdtype(dtype, jnp.floating)):
        return P()
    c = shape[-1]
    if c % model_size != 0 or c < 8 * model_size:
        return P()
    return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))


def state_shardings(state, mesh: Mesh):
    """NamedSharding pytree for a TrainState (or any state pytree): leaves
    channel-sharded over ``model`` per :func:`model_axis_spec`, everything
    else replicated. On a 1-D (pure data) mesh this is all-replicated and
    byte-identical to the pre-TP behavior."""
    model_size = int(dict(zip(mesh.axis_names, mesh.devices.shape))
                     .get(MODEL_AXIS, 1))
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, model_axis_spec(leaf, model_size)),
        state)


def shard_state(state, mesh: Mesh):
    """device_put a host/state pytree with :func:`state_shardings`."""
    return jax.device_put(state, state_shardings(state, mesh))
