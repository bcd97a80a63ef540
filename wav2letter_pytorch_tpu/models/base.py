"""Shared acoustic-model pieces (flax.linen, NTC layout).

Rebuild of the reference's ``ConvCTCASR`` base (/root/reference/
base_asr_models.py:16-94), TPU-first:

* internal layout is ``[B, T, C]`` (channel-last — channels map onto TPU
  lanes; the reference is channel-first ``[B, F, T]``);
* models are pure pytree-parameterized flax modules — the training loop,
  loss, metrics, and optimizer wiring live in ``training/`` instead of a
  LightningModule;
* ``scaling_factor`` (product of conv strides, reference
  base_asr_models.py:33-47) is computed statically from the layer config so
  ``output_lengths = input_lengths // scaling_factor`` stays jit-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def hardtanh_0_20(x):
    """clamp(0, 20) activation (reference wav2letter.py:46, jasper.py:375)."""
    return jnp.clip(x, 0.0, 20.0)


def same_pad_amount(t_in: int, kernel: int, stride: int, dilation: int) -> tuple[int, int]:
    """SAME padding (left, right) for a 1-D conv over a length-``t_in`` axis.

    Produces ceil(t_in / stride) output frames. The reference computes this
    with ``input_channels`` in place of the time length (wav2letter.py:23-27,
    a latent bug that cancels for stride=1); we use the time axis, which at
    trace time is static. Odd padding puts the extra sample on the right,
    matching the reference's ReflectionPad1d split (wav2letter.py:29-32).
    """
    out_t = (t_in + stride - 1) // stride
    pad = max(0, (out_t - 1) * stride + (kernel - 1) * dilation + 1 - t_in)
    return pad // 2, pad - pad // 2


def length_mask(lengths, t: int, dtype=jnp.float32):
    """[B, t, 1] mask of valid frames given per-sample lengths."""
    m = jnp.arange(t)[None, :] < jnp.asarray(lengths)[:, None]
    return m[:, :, None].astype(dtype)


_INITIALIZERS = {
    'xavier_uniform': nn.initializers.xavier_uniform,
    'xavier_normal': nn.initializers.xavier_normal,
    'kaiming_uniform': lambda: nn.initializers.variance_scaling(
        2.0, 'fan_in', 'uniform'),
    'kaiming_normal': lambda: nn.initializers.variance_scaling(
        2.0, 'fan_in', 'truncated_normal'),
}


def conv_initializer(mode: str = 'xavier_uniform'):
    """Weight init schemes matching reference jasper.py:29-42."""
    try:
        return _INITIALIZERS[mode]()
    except KeyError:
        raise ValueError(f'Unknown initialization mode: {mode}')
