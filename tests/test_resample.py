"""Polyphase resampler tests + dataset rate-conversion integration.

The reference has no rate conversion at all — its dataset asserts the
first file's rate (/root/reference/data/data_loader.py:135-138). These
tests pin the first-party resampler (data/resample.py) against analytic
tones, scipy's reference polyphase implementation, and the
``audio_conf.resample`` dataset seam.
"""

import json

import numpy as np
import pytest

from wav2letter_pytorch_tpu.data.audio_io import write_wav
from wav2letter_pytorch_tpu.data.dataset import ManifestDataset
from wav2letter_pytorch_tpu.data.resample import (design_lowpass, resample,
                                                  resample_ratio)

STANDARD_PAIRS = [(48000, 16000), (8000, 16000), (44100, 16000),
                  (22050, 16000), (16000, 8000), (16000, 48000)]


def _tone(seconds, freq, sr):
    t = np.arange(int(seconds * sr)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def test_identity_and_empty():
    x = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
    np.testing.assert_array_equal(resample(x, 16000, 16000), x)
    assert resample(np.zeros(0), 8000, 16000).shape == (0,)


def test_rejects_multichannel():
    with pytest.raises(ValueError):
        resample(np.zeros((10, 2)), 8000, 16000)


@pytest.mark.parametrize('orig,target', STANDARD_PAIRS)
def test_output_length_is_ceil_ratio(orig, target):
    for n in (1, 7, 1000, 16000):
        y = resample(np.zeros(n), orig, target)
        up, down = resample_ratio(orig, target)
        assert len(y) == -(-n * up // down)


@pytest.mark.parametrize('orig,target', STANDARD_PAIRS)
def test_tone_preserved(orig, target):
    """A mid-band tone survives conversion sample-accurately (mid region —
    the filter's edge transient is excluded)."""
    freq = 1000.0
    x = _tone(1.0, freq, orig)
    y = resample(x, orig, target)
    t = np.arange(len(y)) / target
    ref = np.sin(2 * np.pi * freq * t)
    mid = slice(len(y) // 10, -len(y) // 10)
    assert np.max(np.abs(y[mid] - ref[mid])) < 2e-3


def test_aliasing_attenuated():
    """Content above the target Nyquist must not fold down: a 7 kHz tone
    downsampled 48k -> 8k (Nyquist 4 kHz) comes out near-silent."""
    x = _tone(1.0, 7000.0, 48000)
    y = resample(x, 48000, 8000)
    mid = slice(len(y) // 10, -len(y) // 10)
    assert np.sqrt(np.mean(y[mid] ** 2)) < 5e-3  # vs 0.707 in the input


def test_matches_scipy_resample_poly():
    scipy_signal = pytest.importorskip('scipy.signal')
    rng = np.random.default_rng(1)
    for orig, target in STANDARD_PAIRS:
        x = (rng.standard_normal(orig // 2) * 0.1)
        up, down = resample_ratio(orig, target)
        ref = scipy_signal.resample_poly(x, up, down)
        got = resample(x, orig, target)
        assert len(got) == len(ref)
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_filter_dc_gain():
    for up, down in [(1, 3), (2, 1), (160, 441)]:
        h = design_lowpass(up, down)
        assert abs(h.sum() - up) < 1e-9  # unit DC gain pre-scale


@pytest.mark.parametrize('orig,target', STANDARD_PAIRS)
def test_streaming_matches_oneshot_exactly(orig, target):
    """Any chunking of the stream reproduces the one-shot conversion
    bit-for-bit (same dot products, same order) including the flush tail."""
    from wav2letter_pytorch_tpu.data.resample import StreamingResampler
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(9973) * 0.1).astype(np.float32)
    ref = resample(x, orig, target)
    for trial in range(3):
        sr = StreamingResampler(orig, target)
        chunks = np.random.default_rng(trial)
        pieces, i = [], 0
        while i < len(x):
            n = int(chunks.integers(1, 600))
            pieces.append(sr.push(x[i:i + n]))
            i += n
        pieces.append(sr.flush())
        y = np.concatenate(pieces)
        assert y.shape == ref.shape
        np.testing.assert_array_equal(y, ref)


def test_streaming_identity_passthrough():
    from wav2letter_pytorch_tpu.data.resample import StreamingResampler
    sr = StreamingResampler(16000, 16000)
    x = np.arange(10, dtype=np.float32)
    np.testing.assert_array_equal(sr.push(x), x)
    assert len(sr.flush()) == 0


def test_dataset_resamples_mismatched_rate(tmp_path):
    """audio_conf.resample=true: an 8 kHz file flows through a 16 kHz
    dataset, doubled in length; sample_meta agrees with __getitem__."""
    path = tmp_path / 'a8k.wav'
    write_wav(str(path), _tone(0.5, 400.0, 8000) * 0.4, 8000)
    manifest = tmp_path / 'm.jsonl'
    manifest.write_text(json.dumps(
        {'audio_filepath': str(path), 'text': 'hi'}))
    conf = {'sample_rate': 16000, 'window': 'hamming',
            'window_size': 0.02, 'window_stride': 0.01, 'resample': True}
    ds = ManifestDataset(str(manifest), conf, 'english_lowercase')
    audio, target, _, text = ds[0]
    assert len(audio) == 8000  # 0.5 s at 16 kHz
    n_meta, _ = ds.sample_meta(0)
    assert n_meta == len(audio)
    # spot-check content: the 400 Hz tone is intact mid-file
    t = np.arange(len(audio)) / 16000
    ref = 0.4 * np.sin(2 * np.pi * 400.0 * t)
    mid = slice(1000, -1000)
    assert np.max(np.abs(audio[mid] - ref[mid])) < 2e-3


def test_dataset_asserts_without_resample(tmp_path):
    path = tmp_path / 'a8k.wav'
    write_wav(str(path), _tone(0.1, 400.0, 8000), 8000)
    manifest = tmp_path / 'm.jsonl'
    manifest.write_text(json.dumps(
        {'audio_filepath': str(path), 'text': 'hi'}))
    conf = {'sample_rate': 16000, 'window': 'hamming',
            'window_size': 0.02, 'window_stride': 0.01}
    with pytest.raises(AssertionError):
        ManifestDataset(str(manifest), conf, 'english_lowercase')
