"""Wav2Letter: a 1-D convolutional CTC acoustic model (flax, NTC layout).

Rebuild of /root/reference/wav2letter.py:12-92:

* ``Conv1dBlock``: reflect SAME padding -> Conv1d -> BatchNorm(momentum 0.9
  torch-convention, eps 1e-3) -> Dropout -> clamp(0, 20)
  (reference wav2letter.py:40-47);
* ``Wav2Letter``: ``layers[:mid_layers]`` blocks + a 1x1 conv head to
  ``num_labels`` channels with no BN/activation (wav2letter.py:59-71);
  forward emits log_softmax over labels and
  ``output_lengths = input_lengths // prod(strides)`` (wav2letter.py:74-92).

TPU-first notes: channel-last [B, T, C] keeps channels on the 128-lane axis
so XLA tiles every conv onto the MXU as an implicit GEMM; BN + clamp fuse
into the conv epilogue. Padding is computed from the static trace-time T.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .base import conv_initializer, hardtanh_0_20, same_pad_amount


class Conv1dBlock(nn.Module):
    """Reflect-pad SAME conv block with BN, dropout and clamp activation."""
    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    dropout: float = -1.0          # -1 disables, matching the reference
    use_bn: bool = True
    use_activation: bool = True
    init_mode: str = 'xavier_uniform'
    precision: str | None = None   # None = fast bf16 MXU path; 'highest' = full f32
    dtype: Any = None              # conv compute dtype (e.g. bf16); params stay f32
    padding_mode: str = 'reflect'  # 'reflect' (reference parity) | 'zeros'
                                   # (fuses into the conv -> no pad copy)

    @nn.compact
    def __call__(self, x, *, train: bool):
        left, right = same_pad_amount(x.shape[1], self.kernel_size,
                                      self.stride, self.dilation)
        conv_padding = 'VALID'
        if self.padding_mode == 'reflect':
            if left or right:
                x = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode='reflect')
        else:
            conv_padding = [(left, right)]
        x = nn.Conv(self.features, (self.kernel_size,),
                    strides=(self.stride,),
                    kernel_dilation=(self.dilation,),
                    padding=conv_padding, use_bias=True,
                    precision=self.precision, dtype=self.dtype,
                    kernel_init=conv_initializer(self.init_mode))(x)
        if self.use_bn:
            # torch BatchNorm1d(momentum=0.9, eps=1e-3): torch's momentum is
            # the NEW-stats weight, flax's is the RUNNING-stats weight.
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.1, epsilon=1e-3)(x)
        if self.dropout != -1:
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        if self.use_activation:
            x = hardtanh_0_20(x)
        return x.astype(jnp.float32) if self.dtype is not None else x


class Wav2Letter(nn.Module):
    """Wav2Letter conv stack -> log_softmax logits.

    Args mirror the model config group (configuration/model/wav2letter.yaml):
    ``layers`` is the full 20-layer spec, truncated to ``mid_layers`` blocks
    before the 1x1 head (reference wav2letter.py:59).
    """
    layers: Sequence[dict[str, Any]]
    num_labels: int
    mid_layers: int = 1
    init_mode: str = 'xavier_uniform'
    precision: str | None = None
    dtype: Any = None
    padding_mode: str = 'reflect'

    @property
    def scaling_factor(self) -> int:
        f = 1
        for layer in list(self.layers)[: self.mid_layers]:
            f *= int(layer.get('stride', 1))
        return f

    @nn.compact
    def __call__(self, x, input_lengths=None, *, train: bool = False):
        """x: [B, T, F] features. Returns (log_probs [B, T', L], out_lengths)."""
        for i, layer in enumerate(list(self.layers)[: self.mid_layers]):
            x = Conv1dBlock(features=int(layer['output_size']),
                            kernel_size=int(layer['kernel_size']),
                            stride=int(layer.get('stride', 1)),
                            dilation=int(layer.get('dilation', 1)),
                            dropout=float(layer.get('dropout', -1.0)),
                            init_mode=self.init_mode,
                            precision=self.precision, dtype=self.dtype,
                            padding_mode=self.padding_mode,
                            name=f'conv1d_{i}')(x, train=train)
        x = Conv1dBlock(features=self.num_labels, kernel_size=1, stride=1,
                        use_bn=False, use_activation=False,
                        init_mode=self.init_mode, precision=self.precision,
                        dtype=self.dtype,
                        name=f'conv1d_{self.mid_layers}')(x, train=train)
        log_probs = nn.log_softmax(x, axis=-1)
        if input_lengths is None:
            return log_probs, None
        out_lengths = jnp.asarray(input_lengths, jnp.int32) // self.scaling_factor
        return log_probs, out_lengths
