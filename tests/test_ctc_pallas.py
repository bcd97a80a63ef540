"""Pallas CTC kernels vs the scan golden reference (interpret mode on CPU).

The scan implementation (ops/ctc.py) is validated against torch in
test_ctc.py; here the Pallas alpha/beta kernels must reproduce it exactly —
values and gradients — including variable lengths, impossible alignments,
and repeated labels.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wav2letter_pytorch_tpu.ops.ctc import ctc_loss
from wav2letter_pytorch_tpu.ops.ctc_pallas import ctc_loss_pallas

pallas_ctc = functools.partial(ctc_loss_pallas, interpret=True, block_b=4)


def _case(rng, B=4, T=18, L=6, S=5, min_tlen=8):
    logits = rng.standard_normal((B, T, L)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    ll = rng.integers(min_tlen, T + 1, size=B).astype(np.int32)
    tl = rng.integers(1, S + 1, size=B).astype(np.int32)
    tg = rng.integers(1, L, size=(B, S)).astype(np.int32)
    for b in range(B):
        tg[b, tl[b]:] = 0
    return lp, ll, tg, tl


@pytest.mark.parametrize('reduction', ['none', 'mean', 'sum'])
def test_values_match_scan(reduction):
    rng = np.random.default_rng(0)
    lp, ll, tg, tl = _case(rng)
    ours = np.asarray(pallas_ctc(lp, ll, tg, tl, reduction=reduction))
    ref = np.asarray(ctc_loss(lp, ll, tg, tl, reduction=reduction))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_full_length_no_padding():
    # logit_lengths == T: the free-blank funnel never runs; the final-label
    # read position must be included.
    rng = np.random.default_rng(1)
    lp, ll, tg, tl = _case(rng, min_tlen=18)
    assert (ll == 18).all()
    ours = np.asarray(pallas_ctc(lp, ll, tg, tl, reduction='none'))
    ref = np.asarray(ctc_loss(lp, ll, tg, tl, reduction='none'))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_repeated_labels_and_batch_padding():
    # B=3 not a multiple of block_b=4 -> row padding path.
    rng = np.random.default_rng(2)
    B, T, L = 3, 14, 5
    logits = rng.standard_normal((B, T, L)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    tg = np.array([[1, 1, 2], [2, 2, 2], [3, 1, 0]], dtype=np.int32)
    tl = np.array([3, 3, 2], dtype=np.int32)
    ll = np.array([14, 10, 12], dtype=np.int32)
    ours = np.asarray(pallas_ctc(lp, ll, tg, tl, reduction='none'))
    ref = np.asarray(ctc_loss(lp, ll, tg, tl, reduction='none'))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_gradients_match_scan():
    rng = np.random.default_rng(3)
    lp, ll, tg, tl = _case(rng)

    def through_softmax(fn):
        return lambda x: fn(jax.nn.log_softmax(x, axis=-1), ll, tg, tl,
                            reduction='mean')

    logits = jnp.asarray(rng.standard_normal(lp.shape).astype(np.float32))
    ref_loss, ref_grad = jax.value_and_grad(through_softmax(ctc_loss))(logits)
    our_loss, our_grad = jax.value_and_grad(through_softmax(pallas_ctc))(logits)
    np.testing.assert_allclose(float(our_loss), float(ref_loss),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(our_grad), np.asarray(ref_grad),
                               rtol=1e-4, atol=1e-6)


def test_impossible_alignment_zeroed():
    rng = np.random.default_rng(4)
    lp, ll, tg, tl = _case(rng)
    tl[0] = 5
    ll[0] = 3  # cannot emit 5 labels in 3 frames
    ours = np.asarray(pallas_ctc(lp, ll, tg, tl, reduction='none'))
    ref = np.asarray(ctc_loss(lp, ll, tg, tl, reduction='none'))
    assert ours[0] == 0.0
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    g = jax.grad(lambda x: pallas_ctc(x, ll, tg, tl, reduction='sum'))(
        jnp.asarray(lp))
    g = np.asarray(g)
    assert np.isfinite(g).all()
