"""Feature frontend: golden-value parity with the reference pipeline.

The reference extracts per-sample on CPU via torch.stft
(/root/reference/data/data_loader.py:33-88). We recompute the expected
values here with torch ops (dither disabled for determinism) and check our
batched, masked, on-device extractor against them — including the
matmul-DFT STFT path, mel filterbank values, normalization statistics, and
padding-mask behavior.
"""

import math

import numpy as np
import pytest
import torch

from wav2letter_pytorch_tpu.data.features import (AudioConfig,
                                                  SpectrogramFrontend,
                                                  get_window, hz_to_mel,
                                                  mel_filterbank, mel_to_hz,
                                                  num_frames)


def _torch_reference_features(audio: np.ndarray, conf: AudioConfig,
                              n_mels: int, fb: np.ndarray) -> np.ndarray:
    """Reference pipeline recomputed with torch ops (dither=0)."""
    x = torch.tensor(audio, dtype=torch.float32)
    x = torch.cat((x[:1], x[1:] - 0.97 * x[:-1]), dim=0)
    window = torch.tensor(get_window(conf.window, conf.window_size_samples))
    spec = torch.stft(x, n_fft=conf.n_fft, hop_length=conf.hop_samples,
                      win_length=conf.window_size_samples, center=True,
                      window=window, return_complex=True)
    power = spec.abs() ** 2                     # [bins, frames]
    mel = torch.tensor(fb) @ power              # [n_mels, frames]
    feats = torch.log1p(mel + 2 ** -24)
    mean = feats.mean(dim=1, keepdim=True)
    std = feats.std(dim=1, keepdim=True) + 1e-5
    return ((feats - mean) / std).numpy()       # [n_mels, frames]


@pytest.fixture(scope='module')
def conf():
    return AudioConfig(sample_rate=16000, window_size=0.02,
                       window_stride=0.01, window='hamming')


def _sine_noise(rng, n, sr):
    t = np.arange(n) / sr
    return (0.5 * np.sin(2 * np.pi * 440 * t)
            + 0.1 * rng.standard_normal(n)).astype(np.float32)


def test_nfft_is_next_pow2(conf):
    assert conf.window_size_samples == 320
    assert conf.n_fft == 512
    assert conf.hop_samples == 160


def test_mel_scale_roundtrip():
    hz = np.array([0.0, 250.0, 999.0, 1000.0, 4000.0, 8000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(hz)), hz, rtol=1e-10)


def test_mel_filterbank_structure(conf):
    fb = mel_filterbank(16000, 512, 64)
    assert fb.shape == (64, 257)
    assert (fb >= 0).all()
    # Each filter is non-empty and unimodal triangular-ish.
    assert (fb.max(axis=1) > 0).all()
    # Slaney normalization: higher filters are wider, so lower peak.
    assert fb[0].max() > fb[-1].max()


@pytest.mark.parametrize('method', ['matmul', 'fft', 'conv'])
def test_matches_torch_reference_single(conf, method):
    rng = np.random.default_rng(0)
    n = 16000  # 1 second
    audio = _sine_noise(rng, n, conf.sample_rate)

    fb = mel_filterbank(conf.sample_rate, conf.n_fft, 64)
    expected = _torch_reference_features(audio, conf, 64, fb)  # [M, F]

    frontend = SpectrogramFrontend(conf, n_mels=64, stft_method=method,
                                   dither=0.0)
    feats, flens = frontend(audio[None, :], np.array([n]))
    feats = np.asarray(feats)[0]  # [F, M]
    assert int(flens[0]) == expected.shape[1] == num_frames(n, conf.hop_samples)
    np.testing.assert_allclose(feats.T, expected, rtol=1e-3, atol=1e-3)


def test_batched_masked_matches_per_sample(conf):
    # Batch of two different lengths must equal per-sample extraction
    # zero-padded to the batch max (the reference collator's contract).
    rng = np.random.default_rng(1)
    n1, n2 = 16000, 9600
    a1 = _sine_noise(rng, n1, conf.sample_rate)
    a2 = _sine_noise(rng, n2, conf.sample_rate)

    frontend = SpectrogramFrontend(conf, n_mels=64, dither=0.0)
    f1, _ = frontend(a1[None], np.array([n1]))
    f2, _ = frontend(a2[None], np.array([n2]))

    batch_audio = np.zeros((2, n1), np.float32)
    batch_audio[0], batch_audio[1, :n2] = a1, a2
    fb_batch, flens = frontend(batch_audio, np.array([n1, n2]))
    fb_batch = np.asarray(fb_batch)

    t1, t2 = int(flens[0]), int(flens[1])
    np.testing.assert_allclose(fb_batch[0], np.asarray(f1)[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(fb_batch[1, :t2], np.asarray(f2)[0], rtol=2e-4,
                               atol=2e-4)
    # Padding frames are exactly zero.
    assert np.abs(fb_batch[1, t2:]).max() == 0.0


def test_dither_changes_output_deterministically(conf):
    import jax
    rng = np.random.default_rng(2)
    audio = _sine_noise(rng, 8000, conf.sample_rate)[None]
    lens = np.array([8000])
    frontend = SpectrogramFrontend(conf, n_mels=64)
    key = jax.random.PRNGKey(0)
    f1, _ = frontend(audio, lens, rng=key)
    f2, _ = frontend(audio, lens, rng=key)
    f3, _ = frontend(audio, lens, rng=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    assert np.abs(np.asarray(f1) - np.asarray(f3)).max() > 0


def test_8k_variant():
    conf8 = AudioConfig(sample_rate=8000, window_size=0.02,
                        window_stride=0.01, window='hamming')
    assert conf8.n_fft == 256
    rng = np.random.default_rng(3)
    audio = _sine_noise(rng, 8000, 8000)
    frontend = SpectrogramFrontend(conf8, n_mels=64, dither=0.0)
    feats, flens = frontend(audio[None], np.array([8000]))
    assert np.asarray(feats).shape == (1, num_frames(8000, conf8.hop_samples), 64)
    assert np.isfinite(np.asarray(feats)).all()


def test_mfcc_feature_type(conf):
    """MFCC = orthonormal DCT-II of the log-mel bands, checked vs scipy."""
    from scipy.fftpack import dct as scipy_dct
    rng = np.random.default_rng(7)
    audio = _sine_noise(rng, 8000, conf.sample_rate)

    logmel_fe = SpectrogramFrontend(conf, n_mels=64, dither=0.0)
    # reproduce the un-normalized log-mel by disabling normalization via
    # manual recomputation: use the mfcc frontend and invert its norm? No —
    # instead compare the DCT matrix application directly.
    mfcc_fe = SpectrogramFrontend(conf, n_mels=64, dither=0.0,
                                  feature_type='mfcc', n_mfcc=20)
    ref_dct = scipy_dct(np.eye(64), type=2, norm='ortho', axis=0).T[:, :20]
    np.testing.assert_allclose(mfcc_fe.dct, ref_dct.astype(np.float32),
                               rtol=1e-5, atol=1e-6)

    feats, flens = mfcc_fe(audio[None], np.array([8000]))
    assert np.asarray(feats).shape[-1] == 20
    assert np.isfinite(np.asarray(feats)).all()
