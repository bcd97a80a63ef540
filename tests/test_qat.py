"""Quantization-aware finetuning (serving/qat.py).

Contracts under test:
* the fake-quant weight rule is bit-identical to quantize.quantize_folded;
* qat_forward in f32 fake-quant math reproduces the int8 deployment graph
  (infer.offline_forward_q8) for both static and dynamic activation scales;
* straight-through estimators pass gradients inside the quantization range
  and block them where values clip;
* qat_finetune reduces the *int8-deployed* CTC loss of the fold it trains.
"""

import numpy as np
import pytest

from wav2letter_pytorch_tpu.serving import (calibrate_activation_scales,
                                            fold_batchnorm,
                                            offline_forward_q8, qat_finetune,
                                            qat_forward, quantize_folded)
from wav2letter_pytorch_tpu.serving.qat import (fake_quant_act,
                                                fake_quant_weight)
from tests.test_serving_infer import _feats
from tests.test_streaming import SMALL_LAYERS, _build


@pytest.fixture(scope='module')
def small():
    return _build(SMALL_LAYERS)


def _calibrated(small):
    model, variables, frontend = small
    folded = fold_batchnorm(variables, len(SMALL_LAYERS))
    rng = np.random.default_rng(7)
    audio = (rng.standard_normal((2, 24000)) * 0.1).astype(np.float32)
    scales = calibrate_activation_scales(
        SMALL_LAYERS, folded, frontend, audio, np.array([24000, 20000]))
    return folded, scales


def test_fake_quant_weight_matches_quantize_folded(small):
    _, variables, _ = small
    folded = fold_batchnorm(variables, len(SMALL_LAYERS))
    for (w, b), (q, scale, _) in zip(folded, quantize_folded(folded)):
        fq = np.asarray(fake_quant_weight(w))
        np.testing.assert_array_equal(
            fq, q.astype(np.float32) * scale[None, None, :])


def test_qat_forward_matches_q8_static(small):
    model, variables, frontend = small
    folded, scales = _calibrated(small)
    feats, flens = _feats(frontend, [24000, 20800])
    logp_q8, lens_q8 = offline_forward_q8(
        SMALL_LAYERS, quantize_folded(folded), feats, flens,
        act_scales=scales)
    logp_fq, lens_fq = qat_forward(SMALL_LAYERS, folded, feats, flens,
                                   act_scales=scales)
    np.testing.assert_array_equal(np.asarray(lens_fq), np.asarray(lens_q8))
    # The int8 path accumulates exactly in int32; the fake-quant f32 conv
    # sums the same per-tap products with float rounding — tiny drift only.
    np.testing.assert_allclose(np.asarray(logp_fq), np.asarray(logp_q8),
                               atol=5e-3, rtol=1e-3)
    agree = np.mean(np.argmax(np.asarray(logp_fq), -1)
                    == np.argmax(np.asarray(logp_q8), -1))
    assert agree > 0.999


def test_qat_forward_matches_q8_dynamic(small):
    model, variables, frontend = small
    folded = fold_batchnorm(variables, len(SMALL_LAYERS))
    feats, flens = _feats(frontend, [24000, 16000])
    logp_q8, _ = offline_forward_q8(SMALL_LAYERS, quantize_folded(folded),
                                    feats, flens)
    logp_fq, _ = qat_forward(SMALL_LAYERS, folded, feats, flens)
    np.testing.assert_allclose(np.asarray(logp_fq), np.asarray(logp_q8),
                               atol=5e-3, rtol=1e-3)


def test_qat_forward_f32_layers_match_weight_only(small):
    """With every layer activation-exempted, qat_forward equals the
    weight-only int8 path (offline_forward over quantized weights) — the
    same semantics as offline_forward_q8's f32_layers branch, which
    dequantizes the int8 weights but keeps activations f32."""
    from wav2letter_pytorch_tpu.serving import offline_forward
    model, variables, frontend = small
    folded = fold_batchnorm(variables, len(SMALL_LAYERS))
    feats, flens = _feats(frontend, [24000])
    exempt = tuple(range(len(SMALL_LAYERS))) + ('head',)
    logp_fq, _ = qat_forward(SMALL_LAYERS, folded, feats, flens,
                             f32_layers=exempt)
    logp, _ = offline_forward(SMALL_LAYERS, quantize_folded(folded),
                              feats, flens)
    np.testing.assert_allclose(np.asarray(logp_fq), np.asarray(logp),
                               atol=1e-5, rtol=1e-5)
    # And against the q8 implementation's own f32 branch.
    logp_q8, _ = offline_forward_q8(SMALL_LAYERS, quantize_folded(folded),
                                    feats, flens, f32_layers=exempt)
    np.testing.assert_allclose(np.asarray(logp_fq), np.asarray(logp_q8),
                               atol=1e-5, rtol=1e-5)


def test_ste_gradients():
    import jax
    import jax.numpy as jnp
    x = jnp.array([0.4, -3.2, 500.0, -500.0, 1.0])  # last two clip at 127*s
    s = 1.0
    g = jax.grad(lambda v: jnp.sum(fake_quant_act(v, s)))(x)
    np.testing.assert_allclose(np.asarray(g), [1.0, 1.0, 0.0, 0.0, 1.0])
    # Weight fake-quant: gradient passes for every non-clipped entry. The
    # per-channel max element sits exactly on the clip boundary, where
    # JAX's min/max tie gradient splits to 0.5 — a valid subgradient.
    w = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((3, 4, 5)), jnp.float32)
    gw = np.asarray(jax.grad(lambda v: jnp.sum(fake_quant_weight(v)))(w))
    at_max = np.abs(w) == np.max(np.abs(w), axis=(0, 1), keepdims=True)
    np.testing.assert_allclose(gw[~at_max], 1.0, atol=1e-6)
    np.testing.assert_allclose(gw[at_max], 0.5, atol=1e-6)


def test_qat_finetune_improves_int8_loss(small):
    import jax.numpy as jnp

    from wav2letter_pytorch_tpu.training.trainer import masked_ctc_mean

    model, variables, frontend = small
    folded, scales = _calibrated(small)
    rng = np.random.default_rng(3)
    B, L = 2, 24000
    audio = (rng.standard_normal((B, L)) * 0.1).astype(np.float32)
    batch = dict(audio=audio,
                 audio_lengths=np.array([L, L - 3200], np.int32),
                 targets=rng.integers(1, 7, (B, 6)).astype(np.int32),
                 target_lengths=np.array([6, 5], np.int32),
                 batch_mask=np.ones((B,), np.float32))

    def int8_loss(fold):
        feats, flens = frontend(batch['audio'], batch['audio_lengths'])
        logp, out_lens = offline_forward_q8(
            SMALL_LAYERS, quantize_folded(fold), feats, flens,
            act_scales=scales)
        return float(masked_ctc_mean(
            jnp.asarray(logp), out_lens, batch['targets'],
            batch['target_lengths'], batch['batch_mask']))

    before = int8_loss(folded)
    new_folded, history = qat_finetune(
        SMALL_LAYERS, folded, frontend, [batch], act_scales=scales,
        steps=40, learning_rate=3e-3, log_every=10)
    after = int8_loss(new_folded)
    assert len(history) == 4 and history[-1][0] == 40
    assert after < before, (before, after)
    # And the finetuned fold is a drop-in: same shapes/dtypes as the input.
    for (w0, b0), (w1, b1) in zip(folded, new_folded):
        assert np.asarray(w1).shape == np.asarray(w0).shape
        assert np.asarray(b1).shape == np.asarray(b0).shape
