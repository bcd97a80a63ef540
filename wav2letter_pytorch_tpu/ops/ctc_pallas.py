"""CTC loss as Pallas TPU kernels (alpha forward + beta backward).

The ``lax.scan`` implementation (ops/ctc.py) lowers to a T-iteration XLA
while-loop with a per-step gather — correct, but each step is a separate
fusion with loop overhead. These kernels keep the whole recursion on-core:
the alpha/beta state lives in VMEM scratch across grid steps while the
Pallas pipeline streams one time-slice of emission scores per step
(automatic HBM->VMEM double buffering), and the shifted transitions are
lane rolls on the VPU.

Semantics are identical to ops/ctc.py (torch ``nn.CTCLoss(blank, 'mean',
zero_infinity)``) — ctc.py is the golden reference, and
tests/test_ctc_pallas.py checks values and gradients against it.

Key trick: frames past each sample's ``logit_length`` are re-masked so the
blank scores 0 (log-prob) and every label -inf. Repeated "free" blanks
funnel all surviving path mass into the final-blank lattice position, so
the recursion is uniform over the padded T and per-sample loss reads need
no in-kernel length branching. Target padding (blank-interleaved) positions
sit *after* the read position and absorb nothing that is read.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ctc import NEG_INF, _extend_targets


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _logaddexp3(a, b, c):
    m = jnp.maximum(a, jnp.maximum(b, c))
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))


def _shift_right(x, k: int):
    """Shift along the lane (last) axis, filling vacated lanes with NEG_INF."""
    rolled = pltpu.roll(x, shift=k, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col < k, NEG_INF, rolled)


def _shift_left(x, k: int):
    n = x.shape[1]
    rolled = pltpu.roll(x, shift=n - k, axis=1)  # roll requires shift >= 0
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col >= n - k, NEG_INF, rolled)


# --------------------------------------------------------------------------
# Kernels
# --------------------------------------------------------------------------

def _alpha_kernel(lp_ref, skip_ref, alphas_ref, final_ref, alpha):
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    lp_t = lp_ref[0]

    @pl.when(t == 0)
    def _():
        col = jax.lax.broadcasted_iota(jnp.int32, lp_t.shape, 1)
        alpha[:] = jnp.where(col <= 1, lp_t, NEG_INF)

    @pl.when(t > 0)
    def _():
        a = alpha[:]
        s1 = _shift_right(a, 1)
        s2 = jnp.where(skip_ref[:], _shift_right(a, 2), NEG_INF)
        alpha[:] = _logaddexp3(a, s1, s2) + lp_t

    alphas_ref[0] = alpha[:]

    @pl.when(t == n_t - 1)
    def _():
        final_ref[:] = alpha[:]


def _beta_kernel(lp_next_ref, alphas_ref, skip_ref, beta_init_ref, logz_ref,
                 gamma_ref, beta):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        beta[:] = beta_init_ref[:]

    @pl.when(i > 0)
    def _():
        u = beta[:] + lp_next_ref[0]
        s1 = _shift_left(u, 1)
        s2 = _shift_left(jnp.where(skip_ref[:], u, NEG_INF), 2)
        beta[:] = _logaddexp3(u, s1, s2)

    # Posterior of occupying lattice position s at time t_rev.
    gamma_ref[0] = jnp.exp(alphas_ref[0] + beta[:] - logz_ref[:])


# --------------------------------------------------------------------------
# custom_vjp core over extended-label emissions
# --------------------------------------------------------------------------

def _alpha_pass(lp_ext, skip, block_b: int, interpret: bool):
    # lp_ext is TIME-MAJOR [T, B, N]: TPU block shapes constrain the last
    # two dims (sublanes x lanes), so the per-step slice must keep (B, N)
    # as the trailing dims.
    T, B, N = lp_ext.shape
    grid = (B // block_b, T)
    alphas, final = pl.pallas_call(
        _alpha_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_b, N), lambda b, t: (t, b, 0)),
            pl.BlockSpec((block_b, N), lambda b, t: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_b, N), lambda b, t: (t, b, 0)),
            pl.BlockSpec((block_b, N), lambda b, t: (b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, N), jnp.float32),
            jax.ShapeDtypeStruct((B, N), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((block_b, N), jnp.float32)],
        interpret=interpret,
    )(lp_ext, skip)
    return alphas, final


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ctc_logz_ext(lp_ext, skip, final_sel, block_b, interpret):
    """log Z per sample from extended-label emission scores.

    lp_ext: [B, T, N] emission log-probs per lattice position;
    skip: [B, N] bool two-step transition mask;
    final_sel: [B, N] one-hot-ish selection of the read positions.
    """
    _, final = _alpha_pass(lp_ext, skip, block_b, interpret)
    return _read_logz(final, final_sel)


def _read_logz(final, final_sel):
    sel = jnp.where(final_sel, final, NEG_INF)
    return jax.nn.logsumexp(sel, axis=1)


def _ctc_logz_fwd(lp_ext, skip, final_sel, block_b, interpret):
    alphas, final = _alpha_pass(lp_ext, skip, block_b, interpret)
    logz = _read_logz(final, final_sel)
    return logz, (lp_ext, skip, alphas, final_sel, logz)


def _ctc_logz_bwd(block_b, interpret, residuals, g):
    lp_ext, skip, alphas, final_sel, logz = residuals
    T, B, N = lp_ext.shape
    beta_init = jnp.where(final_sel, 0.0, NEG_INF).astype(jnp.float32)
    grid = (B // block_b, T)
    last = T - 1
    gamma = pl.pallas_call(
        _beta_kernel,
        grid=grid,
        in_specs=[
            # lp at t_rev + 1 (clamped at the first grid step, where it is
            # unused because the kernel only initializes beta).
            pl.BlockSpec((1, block_b, N),
                         lambda b, i: (jnp.minimum(T - i, last), b, 0)),
            pl.BlockSpec((1, block_b, N), lambda b, i: (last - i, b, 0)),
            pl.BlockSpec((block_b, N), lambda b, i: (b, 0)),
            pl.BlockSpec((block_b, N), lambda b, i: (b, 0)),
            pl.BlockSpec((block_b, 1), lambda b, i: (b, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_b, N), lambda b, i: (last - i, b, 0)),
        out_shape=jax.ShapeDtypeStruct((T, B, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_b, N), jnp.float32)],
        interpret=interpret,
    )(lp_ext, alphas, skip, beta_init, logz[:, None])
    grad_lp_ext = g[None, :, None] * gamma
    return grad_lp_ext, None, None


_ctc_logz_ext.defvjp(_ctc_logz_fwd, _ctc_logz_bwd)


# --------------------------------------------------------------------------
# Public API
# --------------------------------------------------------------------------

def ctc_loss_pallas(log_probs, logit_lengths, targets, target_lengths,
                    blank: int = 0, reduction: str = 'mean',
                    zero_infinity: bool = True, block_b: int = 8,
                    interpret: bool = False):
    """Drop-in replacement for ops.ctc.ctc_loss backed by Pallas kernels."""
    log_probs = log_probs.astype(jnp.float32)
    logit_lengths = jnp.asarray(logit_lengths, jnp.int32)
    target_lengths = jnp.asarray(target_lengths, jnp.int32)
    targets = jnp.asarray(targets, jnp.int32)
    B, T, L = log_probs.shape

    # Free-blank re-masking of frames past each logit_length (see module doc).
    t_idx = jnp.arange(T)[None, :, None]
    l_idx = jnp.arange(L)[None, None, :]
    in_range = t_idx < logit_lengths[:, None, None]
    pad_frame = jnp.where(l_idx == blank, 0.0, NEG_INF)
    lp = jnp.where(in_range, log_probs, pad_frame)

    ext, allow_skip = _extend_targets(targets, blank)
    N = ext.shape[1]
    N_pad = _round_up(N, 128)
    B_pad = _round_up(B, block_b)

    lp_ext = jnp.take_along_axis(lp, ext[:, None, :], axis=2)  # [B, T, N]
    # Kernels run time-major so (B, N) are the tiled trailing dims.
    lp_ext = jnp.transpose(lp_ext, (1, 0, 2))                   # [T, B, N]
    lp_ext = jnp.pad(lp_ext, ((0, 0), (0, B_pad - B), (0, N_pad - N)),
                     constant_values=NEG_INF)
    skip = jnp.pad(allow_skip, ((0, B_pad - B), (0, N_pad - N)))

    # Read positions: final blank (2*S) always; final label (2*S-1) only
    # when the last frame is a real frame (no free-blank funnel ran).
    pos = jnp.arange(N_pad)[None, :]
    sel_blank = pos == (2 * target_lengths)[:, None]
    sel_label = ((pos == jnp.maximum(2 * target_lengths - 1, 0)[:, None])
                 & (target_lengths > 0)[:, None])
    final_sel = sel_blank | sel_label
    final_sel = jnp.pad(final_sel, ((0, B_pad - B), (0, 0)))
    # Padding rows need one valid read position to avoid NaN logsumexp.
    if B_pad > B:
        final_sel = final_sel.at[B:, 0].set(True)

    logz = _ctc_logz_ext(lp_ext, skip, final_sel, block_b, interpret)[:B]
    neg_log_lik = -logz

    if zero_infinity:
        impossible = neg_log_lik >= -0.5 * NEG_INF
        neg_log_lik = jnp.where(impossible, 0.0, neg_log_lik)

    if reduction == 'none':
        return neg_log_lik
    if reduction == 'sum':
        return jnp.sum(neg_log_lik)
    if reduction == 'mean':
        denom = jnp.maximum(target_lengths, 1).astype(jnp.float32)
        return jnp.mean(neg_log_lik / denom)
    raise ValueError(f'unknown reduction: {reduction!r}')
