"""Fused Pallas STFT kernel vs the XLA frontend paths (interpret mode)."""

import numpy as np
import pytest

from wav2letter_pytorch_tpu.data.features import (AudioConfig,
                                                  SpectrogramFrontend)


def _audio(rng, n, sr):
    t = np.arange(n) / sr
    return (0.5 * np.sin(2 * np.pi * 440 * t)
            + 0.1 * rng.standard_normal(n)).astype(np.float32)


@pytest.mark.parametrize('sr,n', [(16000, 16000), (8000, 8000)])
def test_pallas_frontend_matches_conv(monkeypatch, sr, n):
    import wav2letter_pytorch_tpu.ops.stft_pallas as sp
    orig = sp.stft_mel_log_pallas
    monkeypatch.setattr(sp, 'stft_mel_log_pallas',
                        lambda *a, **kw: orig(*a, interpret=True, **kw))

    conf = AudioConfig(sample_rate=sr)
    rng = np.random.default_rng(0)
    a1 = _audio(rng, n, sr)
    a2 = _audio(rng, int(n * 0.6), sr)
    batch = np.zeros((2, n), np.float32)
    batch[0], batch[1, :len(a2)] = a1, a2
    lens = np.array([n, len(a2)])

    ref_fe = SpectrogramFrontend(conf, n_mels=64, stft_method='conv',
                                 dither=0.0)
    ref, ref_lens = ref_fe(batch, lens)

    pal_fe = SpectrogramFrontend(conf, n_mels=64, stft_method='pallas',
                                 dither=0.0)
    out, out_lens = pal_fe(batch, lens)

    np.testing.assert_array_equal(np.asarray(out_lens), np.asarray(ref_lens))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
