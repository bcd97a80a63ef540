"""Serving offline fast path: BN folding and int8 weight quantization."""

import numpy as np
import pytest

from wav2letter_pytorch_tpu.data.features import (AudioConfig,
                                                  SpectrogramFrontend)
from wav2letter_pytorch_tpu.models.wav2letter import Wav2Letter
from wav2letter_pytorch_tpu.serving import (StreamingWav2Letter,
                                            fold_batchnorm, offline_forward,
                                            quantize_folded, quantized_bytes)
from tests.test_streaming import (N_MELS, SMALL_LAYERS, _build, _offline,
                                  _run_stream)

HOP = 160


@pytest.fixture(scope='module')
def small():
    return _build(SMALL_LAYERS)


def _feats(frontend, lengths, seed=0):
    rng = np.random.default_rng(seed)
    audio = (rng.standard_normal((len(lengths), max(lengths))) * 0.1) \
        .astype(np.float32)
    for b, L in enumerate(lengths):
        audio[b, L:] = 0.0
    return frontend(audio, np.asarray(lengths))


@pytest.mark.parametrize('t_samples', [24000, 24160])  # odd and even frames
def test_offline_forward_matches_model(small, t_samples):
    """BN-folded fused forward == Wav2Letter.apply(train=False) for any
    input length (reflect pads recomputed from the static T like flax)."""
    model, variables, frontend = small
    feats, flens = _feats(frontend, [t_samples, t_samples - 3200])
    ref_logp, ref_lens = model.apply(variables, feats, flens, train=False)
    folded = fold_batchnorm(variables, len(SMALL_LAYERS))
    logp, out_lens = offline_forward(SMALL_LAYERS, folded, feats, flens)
    np.testing.assert_array_equal(np.asarray(out_lens), np.asarray(ref_lens))
    np.testing.assert_allclose(np.asarray(logp), np.asarray(ref_logp),
                               atol=5e-4, rtol=1e-4)


def test_int8_weights_close_and_small(small):
    model, variables, frontend = small
    feats, flens = _feats(frontend, [24000, 20800])
    folded = fold_batchnorm(variables, len(SMALL_LAYERS))
    folded_q = quantize_folded(folded)

    f32_bytes = sum(w.nbytes + b.nbytes for w, b in folded)
    assert quantized_bytes(folded_q) < 0.3 * f32_bytes

    logp_f32, _ = offline_forward(SMALL_LAYERS, folded, feats, flens)
    logp_q, _ = offline_forward(SMALL_LAYERS, folded_q, feats, flens)
    logp_f32, logp_q = np.asarray(logp_f32), np.asarray(logp_q)
    # Weight-only per-channel int8: small logit perturbation, argmax
    # agreement nearly everywhere.
    assert np.mean(np.abs(logp_q - logp_f32)) < 0.05
    agree = np.mean(np.argmax(logp_q, -1) == np.argmax(logp_f32, -1))
    assert agree > 0.95


def test_full_int8_forward_close(small):
    """int8 weights + int8 activations (offline_forward_q8): approximate
    but decode-equivalent to the f32 path on most frames."""
    from wav2letter_pytorch_tpu.serving import offline_forward_q8
    model, variables, frontend = small
    feats, flens = _feats(frontend, [24000, 20800])
    folded = fold_batchnorm(variables, len(SMALL_LAYERS))
    folded_q = quantize_folded(folded)
    logp_f32, lens_f32 = offline_forward(SMALL_LAYERS, folded, feats, flens)
    logp_q8, lens_q8 = offline_forward_q8(SMALL_LAYERS, folded_q, feats,
                                          flens)
    np.testing.assert_array_equal(np.asarray(lens_q8), np.asarray(lens_f32))
    logp_f32, logp_q8 = np.asarray(logp_f32), np.asarray(logp_q8)
    assert np.mean(np.abs(logp_q8 - logp_f32)) < 0.1
    agree = np.mean(np.argmax(logp_q8, -1) == np.argmax(logp_f32, -1))
    assert agree > 0.9


def test_calibrated_static_scales(small):
    """Static calibrated activation scales: same decode behavior as the
    dynamic per-batch scales, no reduction in the serving graph."""
    from wav2letter_pytorch_tpu.serving import (calibrate_activation_scales,
                                                offline_forward_q8)
    model, variables, frontend = small
    folded = fold_batchnorm(variables, len(SMALL_LAYERS))
    folded_q = quantize_folded(folded)

    rng = np.random.default_rng(2)
    cal_audio = (rng.standard_normal((4, 20000)) * 0.1).astype(np.float32)
    scales = calibrate_activation_scales(SMALL_LAYERS, folded, frontend,
                                         cal_audio, np.full(4, 20000))
    assert len(scales) == len(folded) and all(s > 0 for s in scales)

    feats, flens = _feats(frontend, [24000, 20800])
    dyn, _ = offline_forward_q8(SMALL_LAYERS, folded_q, feats, flens)
    stat, _ = offline_forward_q8(SMALL_LAYERS, folded_q, feats, flens,
                                 act_scales=scales)
    dyn, stat = np.asarray(dyn), np.asarray(stat)
    assert np.mean(np.abs(stat - dyn)) < 0.1
    agree = np.mean(np.argmax(stat, -1) == np.argmax(dyn, -1))
    assert agree > 0.9


def test_streaming_int8_full_close(small):
    """Full-int8 streaming (weights + activations) stays decode-close to
    the f32 session."""
    from tests.test_streaming import _run_stream
    model, variables, frontend = small
    stats = (np.zeros(N_MELS, np.float32), np.ones(N_MELS, np.float32))
    fe = SpectrogramFrontend(AudioConfig(), n_mels=N_MELS, dither=0.0,
                             norm_stats=stats)
    kw = dict(chunk_frames=16, norm='precomputed', norm_stats=stats)
    s32 = StreamingWav2Letter(SMALL_LAYERS, 7, variables, fe, **kw)
    sq8 = StreamingWav2Letter(SMALL_LAYERS, 7, variables, fe,
                              weights='int8_full', **kw)
    length = s32.prime_samples + s32.chunk_samples + 777
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal((1, length)) * 0.1).astype(np.float32)
    a, va = _run_stream(s32, audio, np.array([length]))
    b, vb = _run_stream(sq8, audio, np.array([length]))
    v = int(va[0])
    assert v == int(vb[0])
    assert np.mean(np.abs(a[0, :v] - b[0, :v])) < 0.15
    agree = np.mean(np.argmax(a[0, :v], -1) == np.argmax(b[0, :v], -1))
    assert agree > 0.85

    # Static calibrated scales in the streaming session too.
    from wav2letter_pytorch_tpu.serving import calibrate_activation_scales
    scales = calibrate_activation_scales(
        SMALL_LAYERS, fold_batchnorm(variables, len(SMALL_LAYERS)), fe,
        audio, np.array([length]))
    s_stat = StreamingWav2Letter(SMALL_LAYERS, 7, variables, fe,
                                 weights='int8_full', act_scales=scales,
                                 **kw)
    c, vc = _run_stream(s_stat, audio, np.array([length]))
    assert int(vc[0]) == v
    assert np.mean(np.abs(c[0, :v] - a[0, :v])) < 0.15


def test_streaming_int8_matches_offline_int8(small):
    """The int8 streaming session reproduces the int8 offline path (same
    quantized weights, same contract as the f32 parity tests)."""
    model, variables, frontend = small
    stats = (np.zeros(N_MELS, np.float32), np.ones(N_MELS, np.float32))
    frontend_fixed = SpectrogramFrontend(AudioConfig(), n_mels=N_MELS,
                                         dither=0.0, norm_stats=stats)
    sw = StreamingWav2Letter(SMALL_LAYERS, 7, variables, frontend_fixed,
                             chunk_frames=16, norm='precomputed',
                             norm_stats=stats, weights='int8')
    lengths = [sw.prime_samples + 2 * sw.chunk_samples + 1311,
               sw.prime_samples + 2 * sw.chunk_samples + 707]
    rng = np.random.default_rng(42)
    audio = (rng.standard_normal((2, max(lengths))) * 0.1).astype(np.float32)
    for b, L in enumerate(lengths):
        audio[b, L:] = 0.0

    # Offline int8 reference on the zero-padded even-frame buffer.
    margin = (sw.lookahead_frames + 8) * HOP
    pad = max(lengths) + margin
    pad += HOP - pad % HOP
    if (1 + pad // HOP) % 2:
        pad += HOP
    buf = np.zeros((2, pad), np.float32)
    buf[:, :max(lengths)] = audio
    feats, flens = frontend_fixed(buf, np.asarray(lengths))
    folded_q = quantize_folded(fold_batchnorm(variables, len(SMALL_LAYERS)))
    logp_off, out_lens = offline_forward(SMALL_LAYERS, folded_q, feats,
                                         flens)
    logp_off, out_lens = np.asarray(logp_off), np.asarray(out_lens)

    emitted, total_valid = _run_stream(sw, audio, np.asarray(lengths))
    np.testing.assert_array_equal(total_valid, out_lens)
    for b in range(2):
        v = int(total_valid[b])
        np.testing.assert_allclose(emitted[b, :v], logp_off[b, :v],
                                   atol=5e-4, rtol=1e-4)
