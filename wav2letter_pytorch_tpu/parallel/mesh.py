"""Device mesh + sharding helpers for distributed training.

TPU-native replacement for the reference's implicit Lightning-DDP/NCCL
story (SURVEY.md §2.3: the reference has no first-party parallelism; DDP is
reachable only through ``Trainer`` flags). Here data parallelism is explicit
SPMD: a ``jax.sharding.Mesh`` with a ``data`` axis, batches sharded along
it, parameters/optimizer state replicated. The gradient all-reduce is
inserted by the XLA SPMD partitioner and rides ICI — and because the
computation is written against the *global* batch, BatchNorm statistics are
cross-replica exact (sync-BN), matching single-device reference semantics
at any device count. With ``model > 1`` the mesh grows a second
tensor-parallel axis; see ``parallel/tp.py`` for the channel-sharding
rules layered on top.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis: str = 'data',
              model: int = 1, seq: int = 1) -> Mesh:
    """Device mesh: 1-D over ``axis``, growing a ``model`` axis (tensor
    parallelism, see ``parallel/tp.py``) and/or a ``seq`` axis (sequence
    parallelism: activation time dims shard across it and the partitioner
    inserts conv halo exchanges) when their extents exceed 1.

    ``num_devices`` is the DATA-axis extent; ``None``/-1 uses all visible
    devices (divided by ``model * seq`` on a multi-axis mesh). Adjacent
    device ids land on the trailing axes so the chattiest collectives
    (TP psums, SP halos) ride the shortest ICI hops.
    """
    devices = jax.devices()
    model, seq = int(model or 1), int(seq or 1)
    if model <= 1 and seq <= 1:
        if num_devices in (None, -1):
            num_devices = len(devices)
        if num_devices > len(devices):
            raise ValueError(
                f'Requested {num_devices} devices, only {len(devices)} '
                'visible')
        return Mesh(np.array(devices[:num_devices]), (axis,))
    extra = model * seq
    if num_devices in (None, -1):
        num_devices = len(devices) // extra
    total = num_devices * extra
    if num_devices < 1 or total > len(devices):
        raise ValueError(
            f'Requested {num_devices}x{model}x{seq} (data x model x seq) '
            f'devices, only {len(devices)} visible')
    shape = [num_devices] + ([model] if model > 1 else []) \
        + ([seq] if seq > 1 else [])
    names = (axis,) + (('model',) if model > 1 else ()) \
        + (('seq',) if seq > 1 else ())
    return Mesh(np.array(devices[:total]).reshape(shape), names)


def batch_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = 'data',
                batch_dim: int = 0) -> dict:
    """Device-put array leaves of a host batch with batch-dim sharding.

    Non-array entries (texts, paths) pass through untouched on host.
    ``batch_dim``: which array dimension is the batch (1 for step-stacked
    ``[N_steps, B, ...]`` groups used by ``trainer.steps_per_dispatch``).
    """
    spec = P(*([None] * batch_dim + [axis]))
    sharding = NamedSharding(mesh, spec)
    n = mesh.shape[axis]
    multi_host = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            if multi_host:
                # v is this host's shard of the global batch; assemble the
                # global array across processes (per-host input pipelines
                # produce disjoint slices via BucketBatchLoader shard_id).
                out[k] = jax.make_array_from_process_local_data(sharding, v)
                continue
            if v.shape[batch_dim] % n != 0:
                raise ValueError(
                    f'Batch dim of {k!r} ({v.shape[batch_dim]}) must be '
                    f'divisible by the {axis!r} mesh size ({n}); pick a '
                    'batch_size that is a multiple of the device count '
                    '(or set trainer.mesh.data)')
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v
    return out
