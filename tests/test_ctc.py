"""CTC loss: value + gradient parity with torch.nn.CTCLoss.

The reference wires ``nn.CTCLoss(blank=0, reduction='mean',
zero_infinity=True)`` (/root/reference/base_asr_models.py:23,81). Our scan
implementation must match it numerically, including gradients, padding, and
degenerate (impossible / empty-target) cases.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from wav2letter_pytorch_tpu.ops.ctc import ctc_loss


def _random_case(rng, B=3, T=20, L=6, S=5, min_tlen=8, degenerate=False):
    logits = rng.standard_normal((B, T, L)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    logit_lengths = rng.integers(min_tlen, T + 1, size=B).astype(np.int32)
    target_lengths = rng.integers(1, S + 1, size=B).astype(np.int32)
    if degenerate:
        target_lengths[0] = S  # likely impossible with tiny logit_lengths
        logit_lengths[0] = 2
    targets = rng.integers(1, L, size=(B, S)).astype(np.int32)
    for b in range(B):
        targets[b, target_lengths[b]:] = 0
    return np.asarray(log_probs), logit_lengths, targets, target_lengths


def _torch_ctc(log_probs, logit_lengths, targets, target_lengths,
               reduction='mean', with_grad=False):
    lp = torch.tensor(log_probs, requires_grad=with_grad)
    crit = torch.nn.CTCLoss(blank=0, reduction=reduction, zero_infinity=True)
    # torch wants time-major [T, B, L]
    loss = crit(lp.transpose(0, 1), torch.tensor(targets),
                torch.tensor(logit_lengths), torch.tensor(target_lengths))
    if with_grad:
        loss.backward()
        return loss.detach().numpy(), lp.grad.numpy()
    return loss.detach().numpy()


@pytest.mark.parametrize('reduction', ['mean', 'sum', 'none'])
def test_matches_torch_values(reduction):
    rng = np.random.default_rng(0)
    for trial in range(3):
        lp, ll, tg, tl = _random_case(rng)
        ours = np.asarray(ctc_loss(lp, ll, tg, tl, reduction=reduction))
        ref = _torch_ctc(lp, ll, tg, tl, reduction=reduction)
        # float32 logaddexp chains accumulate ~1e-5 relative error vs torch
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_matches_torch_gradients():
    # Compare gradients w.r.t. *logits* (through log_softmax), which is the
    # real training path. torch's CTC backward folds the softmax Jacobian
    # into the loss gradient, so raw grad-w.r.t.-log_probs differs by design;
    # end-to-end through log_softmax both must agree.
    rng = np.random.default_rng(1)
    B, T, L, S = 4, 25, 8, 6
    logits = rng.standard_normal((B, T, L)).astype(np.float32)
    ll = rng.integers(10, T + 1, size=B).astype(np.int32)
    tl = rng.integers(1, S + 1, size=B).astype(np.int32)
    tg = rng.integers(1, L, size=(B, S)).astype(np.int32)
    for b in range(B):
        tg[b, tl[b]:] = 0

    t_logits = torch.tensor(logits, requires_grad=True)
    crit = torch.nn.CTCLoss(blank=0, reduction='mean', zero_infinity=True)
    t_lp = torch.nn.functional.log_softmax(t_logits, dim=-1)
    ref_loss = crit(t_lp.transpose(0, 1), torch.tensor(tg),
                    torch.tensor(ll), torch.tensor(tl))
    ref_loss.backward()
    ref_grad = t_logits.grad.numpy()

    grad_fn = jax.value_and_grad(
        lambda x: ctc_loss(jax.nn.log_softmax(x, axis=-1), ll, tg, tl,
                           reduction='mean'))
    ours_loss, ours_grad = grad_fn(jnp.asarray(logits))
    np.testing.assert_allclose(float(ours_loss), float(ref_loss),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours_grad), ref_grad,
                               rtol=1e-4, atol=1e-5)


def test_impossible_alignment_zeroed():
    # logit_length too short to emit the target -> inf loss -> zeroed.
    rng = np.random.default_rng(2)
    lp, ll, tg, tl = _random_case(rng, degenerate=True, min_tlen=3)
    ours = np.asarray(ctc_loss(lp, ll, tg, tl, reduction='none'))
    ref = _torch_ctc(lp, ll, tg, tl, reduction='none')
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
    assert ours[0] == 0.0  # the degenerate sample really was zeroed

    # Gradient of a zeroed sample must also be zero (and finite everywhere).
    g = jax.grad(lambda x: ctc_loss(x, ll, tg, tl, reduction='sum'))(jnp.asarray(lp))
    g = np.asarray(g)
    assert np.isfinite(g).all()
    np.testing.assert_allclose(g[0], 0.0, atol=1e-6)


def test_repeated_labels():
    # 'aa' requires a blank between the two a's — classic CTC corner case.
    rng = np.random.default_rng(3)
    B, T, L = 2, 12, 4
    logits = rng.standard_normal((B, T, L)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    targets = np.array([[1, 1, 0], [2, 1, 2]], dtype=np.int32)
    tl = np.array([2, 3], dtype=np.int32)
    ll = np.array([12, 10], dtype=np.int32)
    ours = np.asarray(ctc_loss(lp, ll, targets, tl, reduction='none'))
    ref = _torch_ctc(lp, ll, targets, tl, reduction='none')
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_matches_optax():
    optax = pytest.importorskip('optax')
    rng = np.random.default_rng(4)
    lp, ll, tg, tl = _random_case(rng, B=3, T=16, L=7, S=4)
    ours = np.asarray(ctc_loss(lp, ll, tg, tl, reduction='none'))
    B, T, L = lp.shape
    logit_pad = (np.arange(T)[None, :] >= ll[:, None]).astype(np.float32)
    label_pad = (np.arange(tg.shape[1])[None, :] >= tl[:, None]).astype(np.float32)
    theirs = np.asarray(optax.ctc_loss(jnp.asarray(lp), jnp.asarray(logit_pad),
                                       jnp.asarray(tg), jnp.asarray(label_pad)))
    # optax truncates with log_epsilon=-1e5, costing ~1e-2 absolute accuracy;
    # ours matches torch to ~1e-4 (see test_matches_torch_values).
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-2)


def test_jit_and_vmap_compatible():
    rng = np.random.default_rng(5)
    lp, ll, tg, tl = _random_case(rng)
    jitted = jax.jit(lambda *a: ctc_loss(*a))
    eager = ctc_loss(lp, ll, tg, tl)
    np.testing.assert_allclose(np.asarray(jitted(lp, ll, tg, tl)),
                               np.asarray(eager), rtol=1e-6)
