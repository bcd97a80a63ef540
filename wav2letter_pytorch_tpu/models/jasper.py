"""Jasper: BxR residual separable-conv CTC acoustic model (flax, NTC layout).

Rebuild of /root/reference/jasper.py (itself an NVIDIA DeepLearningExamples
port). Components and their reference anchors:

* ``MaskedConv`` — zero-fills frames beyond each sample's length before
  convolving and recomputes lengths with conv arithmetic, keeping float
  lengths until the model head casts to int (jasper.py:69-132, 467);
* ``group_shuffle`` — channel shuffle after grouped convs (jasper.py:135-151);
* ``JasperBlock`` — repeat x (conv -> norm[batch|group|instance|layer] ->
  act -> dropout) with 1x1-conv residual branches, residual_mode add/max,
  separable (depthwise+pointwise) convs, optional head-folding for depthwise
  convs, and dense-residual panes (jasper.py:154-419);
* ``Jasper`` — encoder of ``jasper_blocks[:mid_layers]`` with ReLU +
  separable + masked-conv defaults, 1x1 conv head, log_softmax in training /
  softmax in eval (jasper.py:422-475).

TPU-first notes: NTC layout puts channels on TPU lanes; masking is an
elementwise multiply fused into the conv producer; separable convs become a
depthwise conv (XLA vectorizes on the VPU) + a pointwise GEMM on the MXU.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .base import conv_initializer, hardtanh_0_20

_ACTIVATIONS = {
    'relu': nn.relu,
    'hardtanh': hardtanh_0_20,
    'selu': nn.selu,
}


def compute_new_kernel_size(kernel_size: int, kernel_width: float) -> int:
    """Scale a kernel by ``kernel_width``, rounding even results up to odd
    (reference jasper.py:53-58)."""
    new = max(int(kernel_size * kernel_width), 1)
    return new + 1 if new % 2 == 0 else new


def get_same_padding(kernel_size: int, stride: int, dilation: int) -> int:
    """Symmetric zero padding (reference jasper.py:61-66)."""
    if stride > 1 and dilation > 1:
        raise ValueError('Only stride OR dilation may be greater than 1')
    if dilation > 1:
        return (dilation * kernel_size) // 2 - 1
    return kernel_size // 2


def _use_pallas_depthwise() -> bool:
    """Depthwise-conv backend switch (``W2L_DEPTHWISE=xla|pallas``).

    Measured on-chip (benchmarks/dw_probe.json): the standalone Pallas
    kernel is competitive per-op, but the runtime pays a large fixed cost
    per kernel launch, so adding launches (pad/phase prologues + opaque
    pallas_call that XLA cannot fuse into) makes the END-TO-END jasper
    step slower than XLA's own grouped-conv lowering at batch 32
    (jasper_train_breakdown.json: 24.3 ms vs 12.8 ms fwd+bwd). Default is
    therefore the XLA path; the launch-count fix is the fused
    mask+depthwise+pointwise kernel (ops/sep_conv_pallas.py)."""
    mode = os.environ.get('W2L_DEPTHWISE', 'auto')
    if mode == 'pallas':
        return True
    return False


class _DWKernelParam(nn.Module):
    """Parameter-only stand-in for the anonymous ``nn.Conv`` it replaces:
    registers the same ``kernel`` param (name, shape [K, 1, C], init) under
    the same auto-name ('Conv_0'), so checkpoints and torch imports are
    interchangeable between the XLA and Pallas depthwise paths."""
    kshape: tuple[int, int, int]
    init_mode: str

    @nn.compact
    def __call__(self):
        return self.param('kernel', conv_initializer(self.init_mode),
                          self.kshape, jnp.float32)


class _ConvParamShell(nn.Module):
    """Registers ``<name>/Conv_0/kernel`` exactly where a MaskedConv
    submodule would, for fused paths that bypass the MaskedConv modules
    while keeping the checkpoint tree identical."""
    kshape: tuple[int, int, int]
    init_mode: str

    @nn.compact
    def __call__(self):
        return _DWKernelParam(self.kshape, self.init_mode, name='Conv_0')()


def _use_sep_pallas() -> bool:
    """Fused separable-unit kernel switch (``W2L_SEPCONV=pallas`` opts in).

    Measured on this chip the fused kernel still trails XLA's lowering
    end-to-end (jasper-15 fwd+bwd 25.8 ms vs 12.8 ms at B=32,
    jasper_train_breakdown.json): Mosaic schedules the in-kernel VPU tap
    loops and MXU GEMMs sequentially and the unaligned time-dim tap
    slices lower to per-tap vector shifts, while XLA overlaps its
    (more numerous but individually leaner) kernels. Kept as an opt-in
    backend + parity-tested reference for future Mosaic revisions."""
    return os.environ.get('W2L_SEPCONV', '') == 'pallas'


def group_shuffle(x, groups: int):
    """Interleave channels across groups. x: [B, T, C], C = groups * cpg."""
    B, T, C = x.shape
    x = x.reshape(B, T, groups, C // groups)
    x = jnp.swapaxes(x, 2, 3)
    return x.reshape(B, T, C)


class MaskedConv(nn.Module):
    """1-D conv that masks frames past each sample's length before running.

    ``heads`` folds a depthwise conv over C channels into a depthwise conv
    over ``heads`` channels with C/heads folded into the batch
    (reference jasper.py:124-130). Lengths are returned as float32,
    preserving the reference's true-division quirk (jasper.py:109-112).
    """
    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    heads: int = -1
    padding: int = 0
    use_bias: bool = False
    use_mask: bool = True
    init_mode: str = 'xavier_uniform'
    precision: str | None = None
    dtype: Any = None

    def out_length(self, lens):
        return (lens + 2 * self.padding
                - self.dilation * (self.kernel_size - 1) - 1) / self.stride + 1

    @nn.compact
    def __call__(self, x, lens):
        if self.use_mask and lens is not None:
            T = x.shape[1]
            mask = jnp.arange(T)[None, :] < jnp.asarray(lens, jnp.int32)[:, None]
            x = x * mask[:, :, None].astype(x.dtype)
            lens = self.out_length(jnp.asarray(lens, jnp.float32))

        features, groups = self.features, self.groups
        if (self.kernel_size > 1 and self.heads == -1 and not self.use_bias
                and groups == features == x.shape[-1]
                and _use_pallas_depthwise()):
            # Depthwise: Pallas K-tap FMA kernel (ops/depthwise_pallas.py)
            # in place of XLA's generic grouped-conv lowering.
            from ..ops.depthwise_pallas import depthwise_conv1d
            kernel = _DWKernelParam((self.kernel_size, 1, features),
                                    self.init_mode, name='Conv_0')()
            w = kernel[:, 0, :]
            if self.dtype is not None:
                x, w = x.astype(self.dtype), w.astype(self.dtype)
            x = depthwise_conv1d(x, w, self.stride, self.dilation,
                                 self.padding)
            return x, lens

        if self.heads != -1:
            # Fold channel blocks into batch: [B, T, C] -> [B*C/heads, T, heads]
            B, T, C = x.shape
            x = x.reshape(B, T, C // self.heads, self.heads)
            x = jnp.transpose(x, (0, 2, 1, 3)).reshape(-1, T, self.heads)
            features = groups = self.heads

        x = nn.Conv(features, (self.kernel_size,), strides=(self.stride,),
                    kernel_dilation=(self.dilation,),
                    padding=[(self.padding, self.padding)],
                    feature_group_count=groups, use_bias=self.use_bias,
                    precision=self.precision, dtype=self.dtype,
                    kernel_init=conv_initializer(self.init_mode))(x)

        if self.heads != -1:
            BH, T2, _ = x.shape
            B = BH // (self.features // self.heads)
            x = x.reshape(B, self.features // self.heads, T2, self.heads)
            x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B, T2, self.features)
        return x, lens


class JasperBlock(nn.Module):
    """One Jasper BxR block (reference jasper.py:154-419).

    ``__call__`` takes the list of residual-pane inputs (the last element is
    the block's main input) and returns ``(out, lens)``. With an empty
    ``residual_panes`` and ``residual=True`` the single main input is the
    only residual branch, as in the reference default path.
    """
    planes: int
    repeat: int = 3
    kernel_size: int = 11
    kernel_size_factor: float = 1.0
    stride: int = 1
    dilation: int = 1
    dropout: float = 0.2
    activation: str = 'hardtanh'
    residual: bool = True
    groups: int = 1
    separable: bool = False
    heads: int = -1
    normalization: str = 'batch'
    norm_groups: int = 1
    residual_mode: str = 'add'
    dense_residual: bool = False
    conv_mask: bool = False
    init_mode: str = 'xavier_uniform'
    precision: str | None = None
    dtype: Any = None

    def _norm(self, x, name: str, *, train: bool):
        ng = self.norm_groups
        if ng == -1:
            ng = x.shape[-1]
        if self.normalization == 'batch':
            # torch BatchNorm1d(eps=1e-3, momentum=0.1) -> flax momentum 0.9.
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-3, name=name)(x)
        if self.normalization == 'group':
            return nn.GroupNorm(num_groups=ng, epsilon=1e-5, name=name)(x)
        if self.normalization == 'instance':
            return nn.GroupNorm(num_groups=x.shape[-1], epsilon=1e-5, name=name)(x)
        if self.normalization == 'layer':
            return nn.GroupNorm(num_groups=1, epsilon=1e-5, name=name)(x)
        raise ValueError(
            f'Normalization method ({self.normalization}) does not match '
            'one of [batch, layer, group, instance].')

    def _conv_bn(self, x, lens, out_ch: int, idx: str, *, kernel: int,
                 stride: int, dilation: int, train: bool,
                 groups: int | None = None, heads: int | None = None):
        """``groups``/``heads`` default to the block's values for main-chain
        convs; residual 1x1 branches pass groups=1, heads=-1 — the reference
        builds them with ``_get_conv_bn_layer`` defaults (jasper.py:241-257
        passes neither), so they are plain convs with no GroupShuffle."""
        groups = self.groups if groups is None else groups
        heads = self.heads if heads is None else heads
        pad = get_same_padding(kernel, stride, dilation)
        if (self.separable and kernel > 1 and stride == 1 and heads == -1
                and groups == 1 and _use_sep_pallas()):
            # Fused mask->depthwise->mask->pointwise Pallas kernel
            # (ops/sep_conv_pallas.py); parameter tree identical to the
            # two-MaskedConv path below.
            from ..ops.sep_conv_pallas import sep_conv1d
            cin = x.shape[-1]
            wdw = _ConvParamShell((kernel, 1, cin), self.init_mode,
                                  name=f'{idx}_dw')()[:, 0, :]
            wpw = _ConvParamShell((1, cin, out_ch), self.init_mode,
                                  name=f'{idx}_pw')()[0]
            xin = x if self.dtype is None else x.astype(self.dtype)
            x = sep_conv1d(xin, lens if self.conv_mask else None, wdw, wpw,
                           dilation, pad, use_mask=self.conv_mask)
            if self.conv_mask and lens is not None:
                # the two MaskedConv out_length updates (dw then 1x1 pw)
                lens = (jnp.asarray(lens, jnp.float32) + 2 * pad
                        - dilation * (kernel - 1) - 1) + 1
            x = self._norm(x, f'{idx}_norm', train=train)
            if groups > 1:
                x = group_shuffle(x, groups)
            return x, lens
        if self.separable and kernel > 1:
            x, lens = MaskedConv(features=x.shape[-1], kernel_size=kernel,
                                 stride=stride, dilation=dilation,
                                 groups=x.shape[-1], heads=heads,
                                 padding=pad, use_mask=self.conv_mask,
                                 init_mode=self.init_mode,
                                 precision=self.precision, dtype=self.dtype,
                                 name=f'{idx}_dw')(x, lens)
            x, lens = MaskedConv(features=out_ch, kernel_size=1,
                                 groups=groups, padding=0,
                                 use_mask=self.conv_mask,
                                 init_mode=self.init_mode,
                                 precision=self.precision, dtype=self.dtype,
                                 name=f'{idx}_pw')(x, lens)
        else:
            x, lens = MaskedConv(features=out_ch, kernel_size=kernel,
                                 stride=stride, dilation=dilation,
                                 groups=groups, heads=heads,
                                 padding=pad, use_mask=self.conv_mask,
                                 init_mode=self.init_mode,
                                 precision=self.precision, dtype=self.dtype,
                                 name=f'{idx}_conv')(x, lens)
        if self.dtype is not None:
            x = x.astype(jnp.float32)  # norms + residuals in f32
        x = self._norm(x, f'{idx}_norm', train=train)
        if groups > 1:
            x = group_shuffle(x, groups)
        return x, lens

    @nn.compact
    def __call__(self, pane_inputs: Sequence, lens, *, train: bool):
        act = _ACTIVATIONS[self.activation]
        kernel = compute_new_kernel_size(self.kernel_size,
                                         float(self.kernel_size_factor))
        x = pane_inputs[-1]
        lens_orig = lens
        for r in range(self.repeat - 1):
            x, lens = self._conv_bn(x, lens, self.planes, f'rep{r}',
                                    kernel=kernel, stride=self.stride,
                                    dilation=self.dilation, train=train)
            x = act(x)
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        x, lens = self._conv_bn(x, lens, self.planes, f'rep{self.repeat - 1}',
                                kernel=kernel, stride=self.stride,
                                dilation=self.dilation, train=train)

        if self.residual:
            branches = pane_inputs if self.dense_residual else [pane_inputs[-1]]
            for i, res_in in enumerate(branches):
                r, _ = self._conv_bn(res_in, lens_orig, self.planes,
                                     f'res{i}', kernel=1, stride=1,
                                     dilation=1, train=train,
                                     groups=1, heads=-1)
                x = x + r if self.residual_mode == 'add' else jnp.maximum(x, r)

        x = act(x)
        x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x, lens


class Jasper(nn.Module):
    """Jasper encoder + 1x1 head (reference jasper.py:422-475).

    ``jasper_blocks`` mirrors configuration/model/jasper.yaml; defaults per
    block: stride 1, dilation 1, repeat 1, conv_mask True, separable True,
    dropout 0, ReLU activation (reference jasper.py:439-449). A block may
    set ``residual_dense: true`` to join the dense-residual pane chain
    (Jasper-DR, NVIDIA-style; the reference accepts residual_panes but its
    forward cannot exploit them — jasper.py:387,402).
    """
    jasper_blocks: Sequence[dict[str, Any]]
    num_labels: int
    mid_layers: int = 1
    init_mode: str = 'xavier_uniform'
    precision: str | None = None
    dtype: Any = None
    remat: bool = False
    # Fallback per-block dropout for blocks that don't set their own
    # (`+model.dropout_default=0.3`). The reference's config ships no
    # block dropout and its code defaults to 0 (jasper.py:449), which
    # memorizes small corpora — NVIDIA's published Jasper/QuartzNet
    # recipes all train with per-block dropout 0.2-0.4.
    dropout_default: float = 0.0

    @property
    def scaling_factor(self) -> int:
        # Parity: reference takes the first conv's stride of each block
        # (jasper.py:455-459).
        f = 1
        for b in list(self.jasper_blocks)[: self.mid_layers]:
            f *= int(b.get('stride', 1))
        return f

    @nn.compact
    def __call__(self, x, input_lengths=None, *, train: bool = False):
        """x: [B, T, F]. Returns (log_probs if train else probs, out_lengths)."""
        lens = None if input_lengths is None else jnp.asarray(
            input_lengths, jnp.float32)
        panes = [x]
        for i, b in enumerate(list(self.jasper_blocks)[: self.mid_layers]):
            dense = bool(b.get('residual_dense', False))
            block = JasperBlock(
                planes=int(b['layer_size']),
                repeat=int(b.get('repeat', 1)),
                kernel_size=int(b['kernel_size']),
                kernel_size_factor=float(b.get('kernel_size_factor', 1.0)),
                stride=int(b.get('stride', 1)),
                dilation=int(b.get('dilation', 1)),
                dropout=float(b.get('dropout', self.dropout_default)),
                activation=b.get('activation', 'relu'),
                residual=bool(b.get('residual', True)),
                groups=int(b.get('groups', 1)),
                separable=bool(b.get('separable', True)),
                heads=int(b.get('heads', -1)),
                normalization=b.get('normalization', 'batch'),
                norm_groups=int(b.get('norm_groups', 1)),
                residual_mode=b.get('residual_mode', 'add'),
                dense_residual=dense,
                conv_mask=bool(b.get('conv_mask', True)),
                init_mode=self.init_mode,
                precision=self.precision, dtype=self.dtype,
                name=f'block{i}')
            if self.remat and train:
                # Trade HBM for MXU idle time: the train step is
                # bandwidth-roofline-bound (benchmarks/
                # jasper_train_breakdown.json), so re-running the block
                # forward during backward is cheaper than re-loading every
                # saved conv/norm intermediate from HBM. Parameter tree is
                # unchanged (remat is transparent to variable naming).
                def _fwd(mdl, panes_in, lens_in):
                    return mdl(panes_in, lens_in, train=True)
                out, lens = nn.remat(_fwd)(block, panes, lens)
            else:
                out, lens = block(panes, lens, train=train)
            panes = panes + [out] if dense else [out]
            x = out

        x = nn.Conv(self.num_labels, (1,), use_bias=True,
                    kernel_init=conv_initializer(self.init_mode),
                    precision=self.precision, dtype=self.dtype,
                    name='head')(x)
        x = x.astype(jnp.float32)
        # log-probs in training, true probabilities in eval — the eval
        # output feeds prob-space beam search (reference jasper.py:470-473).
        out = nn.log_softmax(x, axis=-1) if train else nn.softmax(x, axis=-1)
        if lens is None:
            return out, None
        return out, lens.astype(jnp.int32)
