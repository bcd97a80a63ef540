"""CTC loss as a log-space alpha recursion (``lax.scan``), batch-first.

TPU-native replacement for the reference's ``nn.CTCLoss(blank=0,
reduction='mean', zero_infinity=True)`` (/root/reference/base_asr_models.py:23,
applied at base_asr_models.py:81 on time-major transposed logits). Here the
contract is batch-first ``log_probs[B, T, L]`` — no transpose needed; XLA
fuses the per-step gather + logaddexp chain, and gradients come from
autodiff through the scan (exact forward-backward).

Semantics matched to torch (validated in tests/test_ctc.py):
* ``blank`` index configurable (reference always uses 0);
* per-sample loss = -log p(target | logits[:logit_length]);
* ``zero_infinity``: infinite losses (impossible alignments, e.g.
  logit_length < required) are zeroed, as are their gradients;
* reduction 'mean': each loss divided by its target_length (clamped to 1)
  then averaged over the batch; also 'sum' and 'none'.

A Pallas alpha-beta kernel (ops/ctc_pallas.py) accelerates this on TPU; this
scan implementation is the golden reference for it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Large-but-finite stand-in for -inf: keeps logaddexp gradients NaN-free
# while behaving as an identity for any realistically-scaled log prob.
NEG_INF = -1e30


def _extend_targets(targets: jnp.ndarray, blank: int):
    """Interleave blanks: targets [B, S] -> ext [B, 2S+1] plus skip mask.

    ext[2i] = blank, ext[2i+1] = targets[i]. ``allow_skip[s]`` is True where
    the alpha recursion may take the two-step transition (s-2 -> s): only at
    label positions whose label differs from the previous label.
    """
    B, S = targets.shape
    N = 2 * S + 1
    ext = jnp.full((B, N), blank, dtype=targets.dtype)
    ext = ext.at[:, 1::2].set(targets)
    prev_label = jnp.pad(targets[:, :-1], ((0, 0), (1, 0)), constant_values=blank - 1)
    # Position 1 always allows the skip path conceptually, but s-2 = -1 is out
    # of range; handled by masking shifts, so mark label-vs-previous-label only.
    allow_skip = jnp.zeros((B, N), dtype=bool)
    allow_skip = allow_skip.at[:, 1::2].set(targets != prev_label)
    allow_skip = allow_skip.at[:, 1].set(False)  # no s-2 exists for s=1
    return ext, allow_skip


def ctc_forward_alphas(log_probs, logit_lengths, targets, target_lengths,
                       blank: int = 0):
    """Run the alpha recursion; return (final_alphas [B, 2S+1], ext_labels).

    ``final_alphas[b]`` holds log alpha at step ``logit_lengths[b] - 1``
    (updates freeze once t passes each sample's length).
    """
    B, T, L = log_probs.shape
    ext, allow_skip = _extend_targets(targets, blank)
    N = ext.shape[1]

    def gather_ext(lp_t):
        # lp_t: [B, L] -> [B, N] log prob of each extended label this step.
        return jnp.take_along_axis(lp_t, ext, axis=1)

    lp0 = gather_ext(log_probs[:, 0])
    alpha0 = jnp.full((B, N), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(lp0[:, 0])
    if N > 1:
        # Entering the first label is only legal if the target is non-empty.
        first_label = jnp.where(target_lengths > 0, lp0[:, 1], NEG_INF)
        alpha0 = alpha0.at[:, 1].set(first_label)

    neg = jnp.full((B, 1), NEG_INF)

    def step(alpha, inputs):
        lp_t, t = inputs
        lp_ext = gather_ext(lp_t)
        shift1 = jnp.concatenate([neg, alpha[:, :-1]], axis=1)
        shift2 = jnp.concatenate([jnp.tile(neg, (1, 2)), alpha[:, :-2]], axis=1)
        shift2 = jnp.where(allow_skip, shift2, NEG_INF)
        new = jnp.logaddexp(jnp.logaddexp(alpha, shift1), shift2) + lp_ext
        valid = (t < logit_lengths)[:, None]
        new = jnp.where(valid, new, alpha)
        return new, None

    ts = jnp.arange(1, T)
    final, _ = jax.lax.scan(step, alpha0, (jnp.transpose(log_probs[:, 1:], (1, 0, 2)), ts))
    return final, ext


def ctc_loss(log_probs, logit_lengths, targets, target_lengths,
             blank: int = 0, reduction: str = 'mean',
             zero_infinity: bool = True):
    """CTC loss.

    Args:
        log_probs: [B, T, L] log-softmax outputs (batch-first).
        logit_lengths: [B] valid frames per sample.
        targets: [B, S] zero-padded label indices (no blanks inside targets).
        target_lengths: [B] valid labels per sample.
    Returns:
        Scalar loss for 'mean'/'sum', or [B] vector for 'none'.
    """
    log_probs = log_probs.astype(jnp.float32)
    logit_lengths = jnp.asarray(logit_lengths, jnp.int32)
    target_lengths = jnp.asarray(target_lengths, jnp.int32)
    targets = jnp.asarray(targets, jnp.int32)
    B = log_probs.shape[0]

    final, _ = ctc_forward_alphas(log_probs, logit_lengths, targets,
                                  target_lengths, blank)
    # Total probability ends at the final blank (2*S_b) or final label (2*S_b-1).
    idx_blank = (2 * target_lengths)[:, None]
    idx_label = jnp.maximum(2 * target_lengths - 1, 0)[:, None]
    a_blank = jnp.take_along_axis(final, idx_blank, axis=1)[:, 0]
    a_label = jnp.take_along_axis(final, idx_label, axis=1)[:, 0]
    a_label = jnp.where(target_lengths > 0, a_label, NEG_INF)
    neg_log_lik = -jnp.logaddexp(a_blank, a_label)

    if zero_infinity:
        # NEG_INF-backed alphas make impossible alignments come out around
        # +1e30 rather than +inf; zero anything implausibly large either way.
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
