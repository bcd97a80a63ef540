"""Fused separable-conv unit (mask -> depthwise -> mask -> pointwise) as
one Pallas TPU kernel per direction.

The Jasper/QuartzNet repeat unit runs, in XLA, as a chain of kernels:
mask multiply, grouped depthwise conv (whose TPU lowering achieves only
~200-300 GB/s effective — benchmarks/dw_probe.json), the 1x1 pointwise
GEMM, plus the intermediate [B, T, C] tensors bouncing through HBM
between them. Measured end to end, the jasper-15 train step sits at
~30 TFLOPS across batch sizes 32-256 (jasper_train_breakdown.json) —
bandwidth-bound on the depthwise+elementwise traffic, not launch- or
FLOP-bound.

This kernel performs the whole unit in ONE pass per (batch row, Cin
tile): the input tile is masked and SAME-padded in VMEM, the K-tap
depthwise FMA runs on the VPU over VMEM-resident data, the result is
masked to the unit's output length and fed straight into the pointwise
GEMM on the MXU, accumulating the [T_out, Cout] output block across Cin
tiles (the block stays resident in VMEM while the inner grid dimension
walks Cin). x is read once; y is written once; the depthwise
intermediate never touches HBM.

The backward pass is ONE kernel too: it recomputes the (cheap, VPU)
depthwise intermediate from x, then produces all three cotangents —
dWpw = dwres^T g and g_dw = g Wpw^T on the MXU, dWdw as the K-tap
multiply-reduce and dx as the flipped-kernel conv of g_dw on the VPU —
accumulating the weight grads across the batch grid dimension.

Semantics match the reference exactly (jasper.py:69-132, 198-236): the
depthwise conv masks ITS input by the incoming lengths, and the
pointwise conv masks ITS input by the depthwise output lengths, so
train-mode BatchNorm sees zeros past each sample's length on both paths.
Stride is 1 (every Jasper/QuartzNet separable block except the stride-2
prologue, which uses the unfused path); dilation is supported
(QuartzNet C2).

Parity: tests/test_sep_conv_pallas.py (interpret mode) +
scripts/run_tpu_checks.py (compiled on chip) against the two-conv lax
reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_VMEM_BUDGET = 10 * 1024 * 1024


def _cin_tile(cin: int, cout: int, t: int, t_out: int, k: int) -> int | None:
    """Cin tile: divides Cin, keeps (x tile + resident y + weights) within
    budget. None -> caller falls back to the unfused path."""
    resident = t_out * cout * 4  # y block, f32, resident across Cin tiles
    for ct in (512, 256, 128, 64):
        if cin % ct:
            continue
        per_step = (t + t_out) * ct * 4 * 2 + ct * cout * 4 + k * ct * 4
        if per_step + resident <= _VMEM_BUDGET:
            return ct
    if cin <= 512:
        per_step = (t + t_out) * cin * 4 * 2 + cin * cout * 4 + k * cin * 4
        if per_step + resident <= _VMEM_BUDGET:
            return cin
    return None


def _sep_fwd_kernel(x_ref, m1_ref, m2_ref, wdw_ref, wpw_ref, y_ref, *,
                    K, d, p, t_out, use_mask):
    x = x_ref[0].astype(jnp.float32)                       # [T, CT]
    if use_mask:
        x = x * m1_ref[0].astype(jnp.float32)              # [T, 1]
    xp = jnp.pad(x, ((p, p), (0, 0)))
    acc = jnp.zeros((t_out, x.shape[1]), jnp.float32)
    for k in range(K):
        acc = acc + xp[k * d:k * d + t_out, :] \
            * wdw_ref[k, :].astype(jnp.float32)[None, :]
    if use_mask:
        acc = acc * m2_ref[0].astype(jnp.float32)          # [t_out, 1]
    part = jnp.dot(acc, wpw_ref[:].astype(jnp.float32),
                   preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(1) == 0)
    def _():
        y_ref[0] = part

    @pl.when(pl.program_id(1) != 0)
    def _():
        y_ref[0] += part


def _sep_bwd_kernel(x_ref, m1_ref, m2_ref, g_ref, wdw_ref, wpw_ref,
                    dx_ref, dwdw_ref, dwpw_ref, *, K, d, p, t_out, use_mask):
    b = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)
    if use_mask:
        x = x * m1_ref[0].astype(jnp.float32)
    xp = jnp.pad(x, ((p, p), (0, 0)))
    dwres = jnp.zeros((t_out, x.shape[1]), jnp.float32)
    for k in range(K):
        dwres = dwres + xp[k * d:k * d + t_out, :] \
            * wdw_ref[k, :].astype(jnp.float32)[None, :]
    g = g_ref[0].astype(jnp.float32)                       # [t_out, Cout]
    if use_mask:
        m2 = m2_ref[0].astype(jnp.float32)
        dwres = dwres * m2

    @pl.when(b == 0)
    def _():
        dwpw_ref[:] = jnp.zeros_like(dwpw_ref)
        dwdw_ref[:] = jnp.zeros_like(dwdw_ref)

    # dWpw = (dwres * m2)^T g  — contract the time dimension on the MXU
    dwpw_ref[:] += jax.lax.dot_general(
        dwres, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # g_dw = (g Wpw^T) * m2 — cotangent at the depthwise output
    g_dw = jax.lax.dot_general(
        g, wpw_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if use_mask:
        g_dw = g_dw * m2
    for k in range(K):
        dwdw_ref[k, :] += jnp.sum(xp[k * d:k * d + t_out, :] * g_dw, axis=0)
    # dx: flipped-kernel conv of g_dw at transposed padding d(K-1) - p
    pt = d * (K - 1) - p
    gp = jnp.pad(g_dw, ((pt, pt), (0, 0)))
    T = x.shape[0]
    dx = jnp.zeros((T, x.shape[1]), jnp.float32)
    for k in range(K):
        dx = dx + gp[k * d:k * d + T, :] \
            * wdw_ref[K - 1 - k, :].astype(jnp.float32)[None, :]
    if use_mask:
        dx = dx * m1_ref[0].astype(jnp.float32)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _masks(lens, T: int, t_out: int, K: int, d: int, p: int):
    """(mask1 [B,T,1] from the incoming lens, mask2 [B,t_out,1] from the
    depthwise output lens) — int-cast first, as MaskedConv does."""
    li = jnp.asarray(lens, jnp.int32)
    m1 = (jnp.arange(T)[None, :] < li[:, None])[..., None]
    lens_dw = (jnp.asarray(lens, jnp.float32) + 2 * p - d * (K - 1) - 1) + 1
    m2 = (jnp.arange(t_out)[None, :]
          < lens_dw.astype(jnp.int32)[:, None])[..., None]
    return m1.astype(jnp.float32), m2.astype(jnp.float32)


def sep_conv1d_xla(x, lens, wdw, wpw, dilation: int = 1, padding: int = 0,
                   use_mask: bool = True):
    """Reference path: mask -> grouped conv -> mask -> 1x1 conv (exactly
    the two-MaskedConv chain of models/jasper.py _conv_bn)."""
    B, T, C = x.shape
    K = wdw.shape[0]
    t_out = T + 2 * padding - dilation * (K - 1)
    if use_mask and lens is not None:
        m1, m2 = _masks(lens, T, t_out, K, dilation, padding)
        x = x * m1.astype(x.dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, (K, 1, C),
                                        ('NHC', 'HIO', 'NHC'))
    h = jax.lax.conv_general_dilated(
        x, wdw[:, None, :].astype(x.dtype), window_strides=(1,),
        padding=[(padding, padding)], rhs_dilation=(dilation,),
        dimension_numbers=dn, feature_group_count=C)
    if use_mask and lens is not None:
        h = h * m2.astype(h.dtype)
    return jnp.einsum('btc,cf->btf', h.astype(jnp.float32),
                      wpw.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _sep_op(x, lens, wdw, wpw, dilation, padding, use_mask, interpret):
    y = _sep_fwd(x, lens, wdw, wpw, dilation, padding, use_mask, interpret)
    if y is None:
        return sep_conv1d_xla(x, lens, wdw, wpw, dilation, padding, use_mask)
    return y


def _sep_fwd(x, lens, wdw, wpw, d, p, use_mask, interpret):
    B, T, C = x.shape
    K = wdw.shape[0]
    Cout = wpw.shape[1]
    t_out = T + 2 * p - d * (K - 1)
    ct = _cin_tile(C, Cout, T, t_out, K)
    if ct is None:
        return None
    if use_mask and lens is not None:
        m1, m2 = _masks(lens, T, t_out, K, d, p)
    else:
        use_mask = False
        m1 = jnp.zeros((B, 1, 1), jnp.float32)   # placeholder operands
        m2 = jnp.zeros((B, 1, 1), jnp.float32)
    mt, mt2 = (T, t_out) if use_mask else (1, 1)
    kernel = functools.partial(_sep_fwd_kernel, K=K, d=d, p=p, t_out=t_out,
                               use_mask=use_mask)
    return pl.pallas_call(
        kernel,
        grid=(B, C // ct),
        in_specs=[
            pl.BlockSpec((1, T, ct), lambda b, c: (b, 0, c)),
            pl.BlockSpec((1, mt, 1), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((1, mt2, 1), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((K, ct), lambda b, c: (0, c)),
            pl.BlockSpec((ct, Cout), lambda b, c: (c, 0)),
        ],
        out_specs=pl.BlockSpec((1, t_out, Cout), lambda b, c: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, t_out, Cout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * t_out * C * (K + Cout),
            bytes_accessed=(B * T * C + B * t_out * Cout) * 4,
            transcendentals=0),
        interpret=interpret,
    )(x, m1, m2, wdw, wpw)


def _sep_op_fwd(x, lens, wdw, wpw, dilation, padding, use_mask, interpret):
    y = _sep_op(x, lens, wdw, wpw, dilation, padding, use_mask, interpret)
    return y, (x, lens, wdw, wpw)


def _sep_op_bwd(d, p, use_mask, interpret, res, g):
    x, lens, wdw, wpw = res
    B, T, C = x.shape
    K = wdw.shape[0]
    Cout = wpw.shape[1]
    t_out = g.shape[1]
    ct = _cin_tile(C, Cout, T, t_out, K)
    if ct is None:
        _, vjp = jax.vjp(
            lambda xv, wd, wp: sep_conv1d_xla(xv, lens, wd, wp, d, p,
                                              use_mask), x, wdw, wpw)
        dx, dwdw, dwpw = vjp(g)
        return dx, None, dwdw, dwpw
    if use_mask and lens is not None:
        m1, m2 = _masks(lens, T, t_out, K, d, p)
        um = True
    else:
        um = False
        m1 = jnp.zeros((B, 1, 1), jnp.float32)
        m2 = jnp.zeros((B, 1, 1), jnp.float32)
    mt, mt2 = (T, t_out) if um else (1, 1)
    kernel = functools.partial(_sep_bwd_kernel, K=K, d=d, p=p, t_out=t_out,
                               use_mask=um)
    dx, dwdw, dwpw = pl.pallas_call(
        kernel,
        grid=(C // ct, B),  # batch innermost: weight grads accumulate
        in_specs=[
            pl.BlockSpec((1, T, ct), lambda c, b: (b, 0, c)),
            pl.BlockSpec((1, mt, 1), lambda c, b: (b, 0, 0)),
            pl.BlockSpec((1, mt2, 1), lambda c, b: (b, 0, 0)),
            pl.BlockSpec((1, t_out, Cout), lambda c, b: (b, 0, 0)),
            pl.BlockSpec((K, ct), lambda c, b: (0, c)),
            pl.BlockSpec((ct, Cout), lambda c, b: (c, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, T, ct), lambda c, b: (b, 0, c)),
            pl.BlockSpec((K, ct), lambda c, b: (0, c)),
            pl.BlockSpec((ct, Cout), lambda c, b: (c, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, C), x.dtype),
            jax.ShapeDtypeStruct((K, C), jnp.float32),
            jax.ShapeDtypeStruct((C, Cout), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * t_out * C * (3 * K + 2 * Cout),
            bytes_accessed=(2 * B * T * C + B * t_out * Cout) * 4,
            transcendentals=0),
        interpret=interpret,
    )(x, m1, m2, g, wdw, wpw)
    return dx, None, dwdw.astype(wdw.dtype), dwpw.astype(wpw.dtype)


_sep_op.defvjp(_sep_op_fwd, _sep_op_bwd)


def sep_conv1d(x, lens, wdw, wpw, dilation: int = 1, padding: int = 0,
               use_mask: bool = True, interpret: bool = False):
    """Fused masked separable conv unit. x [B,T,Cin], wdw [K,Cin],
    wpw [Cin,Cout] -> y [B,T_out,Cout] f32 (T_out = T + 2p - d(K-1);
    stride 1). Differentiable in x/wdw/wpw; ``lens`` (may be None) only
    shapes the masks and gets no cotangent.
    """
    return _sep_op(x, lens, wdw, wpw, int(dilation), int(padding),
                   bool(use_mask), bool(interpret))
