"""Depthwise 1-D convolution as a Pallas TPU kernel (fwd + custom VJP).

Why: the Jasper/QuartzNet separable blocks (models/jasper.py, reference
jasper.py:154-419) spend most of their step time in depthwise convs.
XLA lowers a grouped conv with ``feature_group_count == C`` through its
generic convolution path, which runs far below the op's roofline on TPU
(benchmarks/jasper_probe.py); the whole jasper-15 train step measured
~19% of the chip's practical peak (benchmarks/jasper_train_breakdown.json)
with the depthwise lowering as the dominant sink.

A depthwise conv is K shifted fused multiply-adds over a [T, C] tile:

    y[t, c] = sum_k w[k, c] * x_pad[t*s + k*d, c]

so the right TPU program is: keep one batch row's [T_pad, C_tile] in VMEM
and run the K-tap FMA loop on the VPU — one HBM pass over x and y instead
of XLA's generic conv machinery. Strides are handled by de-interleaving
the padded input into ``s`` phase planes outside the kernel (every tap k
then reads phase ``(k*d) % s`` at a stride-1 offset — no strided loads in
the kernel). The backward pass reuses the same kernel: dx is a depthwise
conv of the (zero-stuffed, for s>1) cotangent with the flipped kernel,
and dw is the matching K-tap multiply-reduce, accumulated across the
batch grid dimension in VMEM.

Layouts: x [B, T, C] (channels on lanes), w [K, C]. All accumulation is
f32 regardless of input dtype (bf16 in -> bf16 out, f32 accumulate), the
same contract as flax ``nn.Conv(dtype=bf16)``.

Parity: tests/test_depthwise_pallas.py checks fwd and grads against
``lax.conv_general_dilated`` over odd/even kernels, strides, dilations,
and channel counts, in interpret mode on CPU and compiled on TPU
(scripts/run_tpu_checks.py). The on-chip reference runs at
``precision='highest'``: XLA's DEFAULT grouped-conv lowering itself
rounds through bf16 MXU passes on some geometries (up to 2.6e-1 dw error
vs a float64 oracle — benchmarks/dw_precision_oracle.json), while this
kernel accumulates in f32 and lands within 3e-5 of the oracle on every
shipped geometry. Round 4 misread that comparison as a Pallas backward
bug; the oracle study shows the kernel is the MORE precise side.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# VMEM budget for one grid step's blocks (x tile + y tile, double-buffered
# by the pipeline). Conservative: the chip has ~16 MB minus header room.
_VMEM_BUDGET = 8 * 1024 * 1024


def _out_length(t: int, k: int, s: int, d: int, p: int) -> int:
    """Conv output length (reference jasper.py:109-112, floor division)."""
    return (t + 2 * p - d * (k - 1) - 1) // s + 1


def _lane_tile(c: int, t_rows: int, itemsize: int) -> int | None:
    """Largest channel tile that divides C and fits the VMEM budget.

    ``t_rows``: total time rows resident per grid step (input + output
    blocks). Returns None when even the smallest tile would blow the
    budget (the caller falls back to the XLA path — extreme T only).
    """
    for ct in (512, 384, 256, 128, 64, 32):
        if c % ct:
            continue
        if t_rows * ct * itemsize * 2 <= _VMEM_BUDGET:
            return ct
    if c <= 512 and t_rows * c * itemsize * 2 <= _VMEM_BUDGET:
        return c  # C not a multiple of a nice tile (e.g. 64): one tile
    return None


def _dw_fma_kernel(x_ref, w_ref, y_ref, *, taps, t_out):
    """y[t] = sum_k w[k] * phase[r_k][t + q_k]; taps = [(phase, offset)]*K.

    x_ref [1, n_phases, L, CT], w_ref [K, CT], y_ref [1, t_out, CT].
    The K-tap loop runs on the VPU over VMEM-resident data. Taps unroll
    statically: Mosaic requires sublane-dim slice offsets it can prove
    aligned, which a fori_loop's traced ``k*d`` is not, while static
    unaligned offsets lower to vector shifts.
    """
    ct = x_ref.shape[-1]
    acc = jnp.zeros((t_out, ct), jnp.float32)
    for k, (phase, off) in enumerate(taps):
        seg = x_ref[0, phase, off:off + t_out, :]
        acc = acc + seg.astype(jnp.float32) * (
            w_ref[k, :].astype(jnp.float32)[None, :])
    y_ref[0] = acc.astype(y_ref.dtype)


def _dw_wgrad_kernel(x_ref, g_ref, dw_ref, *, taps, t_out):
    """dw[k] = sum_{b,t} phase[r_k][t + q_k] * g[t], accumulated over the
    batch grid dimension (grid = (C_tiles, B), batch innermost: the dw
    block's index_map is constant across b, so it stays resident in VMEM
    and the += accumulates; b == 0 initializes)."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    g = g_ref[0].astype(jnp.float32)
    for k, (phase, off) in enumerate(taps):
        seg = x_ref[0, phase, off:off + t_out, :].astype(jnp.float32)
        dw_ref[k, :] += jnp.sum(seg * g, axis=0)


def _phase_views(x, k: int, s: int, d: int, p: int, t_out: int):
    """Pad x and de-interleave into s stride-1 phase planes.

    Returns (planes [B, s, L, C], taps [(phase, offset)] * K) such that
    tap ``kk`` of the strided conv reads ``planes[:, (kk*d) % s,
    (kk*d)//s + t, :]`` for t in [0, t_out).
    """
    B, T, C = x.shape
    max_off = max(((kk * d) // s for kk in range(k)), default=0)
    L = max_off + t_out
    need = L * s  # samples consumed from the padded signal
    right = max(0, need - T - p)
    xp = jnp.pad(x, ((0, 0), (p, right), (0, 0)))
    xp = xp[:, :need, :]
    planes = xp.reshape(B, L, s, C).transpose(0, 2, 1, 3)
    taps = [((kk * d) % s, (kk * d) // s) for kk in range(k)]
    return planes, taps


def _dw_pallas(x, w, s: int, d: int, p: int, interpret: bool):
    """Forward pallas_call. x [B,T,C], w [K,C] -> y [B,T_out,C] or None
    when the shape exceeds the VMEM budget."""
    B, T, C = x.shape
    K = w.shape[0]
    t_out = _out_length(T, K, s, d, p)
    planes, taps = _phase_views(x, K, s, d, p, t_out)
    L = planes.shape[2]
    ct = _lane_tile(C, s * L + t_out, x.dtype.itemsize)
    if ct is None:
        return None
    kernel = functools.partial(_dw_fma_kernel, taps=taps, t_out=t_out)
    return pl.pallas_call(
        kernel,
        grid=(B, C // ct),
        in_specs=[
            pl.BlockSpec((1, s, L, ct), lambda b, c: (b, 0, 0, c)),
            pl.BlockSpec((K, ct), lambda b, c: (0, c)),
        ],
        out_specs=pl.BlockSpec((1, t_out, ct), lambda b, c: (b, 0, c)),
        out_shape=jax.ShapeDtypeStruct((B, t_out, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * t_out * K * C,
            bytes_accessed=(B * s * L * C + B * t_out * C) * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(planes, w)


def _dw_pallas_wgrad(x, g, K: int, s: int, d: int, p: int, interpret: bool):
    """dL/dw [K, C] f32 from x [B,T,C] and cotangent g [B,T_out,C], or
    None when the shape exceeds the VMEM budget."""
    B, T, C = x.shape
    t_out = g.shape[1]
    planes, taps = _phase_views(x, K, s, d, p, t_out)
    L = planes.shape[2]
    ct = _lane_tile(C, s * L + t_out + K, 4)
    if ct is None:
        return None
    kernel = functools.partial(_dw_wgrad_kernel, taps=taps, t_out=t_out)
    return pl.pallas_call(
        kernel,
        grid=(C // ct, B),  # batch innermost: dw block accumulates in VMEM
        in_specs=[
            pl.BlockSpec((1, s, L, ct), lambda c, b: (b, 0, 0, c)),
            pl.BlockSpec((1, t_out, ct), lambda c, b: (b, 0, c)),
        ],
        out_specs=pl.BlockSpec((K, ct), lambda c, b: (0, c)),
        out_shape=jax.ShapeDtypeStruct((K, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * t_out * K * C,
            bytes_accessed=(B * s * L * C + B * t_out * C) * 4,
            transcendentals=0),
        interpret=interpret,
    )(planes, g)


def depthwise_conv1d_xla(x, w, stride: int = 1, dilation: int = 1,
                         padding: int = 0, precision=None):
    """Reference path: lax grouped conv (feature_group_count == C).

    NOTE on precision: with the default ``precision=None``, XLA:TPU lowers
    some grouped-conv geometries (fwd AND the autodiff backward convs)
    through bf16 MXU passes — measured up to 5.6e-3 fwd / 2.6e-1 dw error
    vs a float64 host oracle (benchmarks/dw_precision_oracle.json), while
    the Pallas kernel above is f32-exact (<=3e-5). Pass
    ``precision='highest'`` when this function serves as a numerical
    reference; leave the default when it serves as the production
    fallback (matching the flax conv path's default-precision contract).
    """
    C = x.shape[-1]
    dn = jax.lax.conv_dimension_numbers(x.shape, (w.shape[0], 1, C),
                                        ('NHC', 'HIO', 'NHC'))
    return jax.lax.conv_general_dilated(
        x, w[:, None, :].astype(x.dtype), window_strides=(stride,),
        padding=[(padding, padding)], rhs_dilation=(dilation,),
        dimension_numbers=dn, feature_group_count=C, precision=precision)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _dw_op(x, w, stride, dilation, padding, interpret):
    y = _dw_pallas(x, w, stride, dilation, padding, interpret)
    if y is None:  # VMEM budget exceeded (extreme T): XLA fallback
        return depthwise_conv1d_xla(x, w, stride, dilation, padding)
    return y


def _dw_op_fwd(x, w, stride, dilation, padding, interpret):
    return _dw_op(x, w, stride, dilation, padding, interpret), (x, w)


def _dw_op_bwd(stride, dilation, padding, interpret, res, g):
    x, w = res
    B, T, C = x.shape
    K = w.shape[0]
    # dx: conv of the (zero-stuffed, for stride>1) cotangent with the
    # flipped kernel at transposed padding d*(K-1) - p. Stride flooring
    # leaves `rem` trailing input positions that feed only later taps:
    # the dilated cotangent gets `rem` extra right zeros so the stride-1
    # conv below emits exactly T outputs with the correct tail gradient.
    if stride > 1:
        rem = (T + 2 * padding - dilation * (K - 1) - 1) % stride
        g_in = jax.lax.pad(g, jnp.zeros((), g.dtype),
                           ((0, 0, 0), (0, rem, stride - 1), (0, 0, 0)))
    else:
        g_in = g
    pad_t = dilation * (K - 1) - padding
    w_flip = w[::-1]
    if pad_t < 0:
        # More fwd padding than the kernel extent (cannot happen for the
        # Jasper geometries; guarded for generality): trim instead.
        g_in = g_in[:, -pad_t:g_in.shape[1] + pad_t, :]
        pad_t = 0
    dx = _dw_pallas(g_in, w_flip, 1, dilation, pad_t, interpret)
    if dx is None:
        dx = depthwise_conv1d_xla(g_in, w_flip, 1, dilation, pad_t)
    if dx.shape[1] < T:
        # stride flooring: trailing inputs that feed no output get 0 grad
        dx = jnp.pad(dx, ((0, 0), (0, T - dx.shape[1]), (0, 0)))
    elif dx.shape[1] > T:
        dx = dx[:, :T, :]
    dw = _dw_pallas_wgrad(x, g, K, stride, dilation, padding, interpret)
    if dw is None:
        _, vjp = jax.vjp(
            lambda wv: depthwise_conv1d_xla(x, wv, stride, dilation,
                                            padding), w)
        (dw,) = vjp(g)
    return dx.astype(x.dtype), dw.astype(w.dtype)


_dw_op.defvjp(_dw_op_fwd, _dw_op_bwd)


def depthwise_conv1d(x, w, stride: int = 1, dilation: int = 1,
                     padding: int = 0, interpret: bool = False):
    """Depthwise 1-D conv, Pallas on TPU. x [B,T,C], w [K,C] -> [B,T',C].

    Matches ``lax.conv_general_dilated(..., feature_group_count=C)`` with
    symmetric ``padding`` (the Jasper SAME padding, models/jasper.py
    ``get_same_padding``). Differentiable in x and w via custom VJP; both
    backward passes are single-HBM-pass Pallas programs. ``interpret``
    runs the kernels in the Pallas interpreter (CPU tests).
    """
    return _dw_op(x, w, int(stride), int(dilation), int(padding),
                  bool(interpret))
