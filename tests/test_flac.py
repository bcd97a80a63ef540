"""FLAC codec tests: round-trips, native/Python cross-checks, audio_io routing.

The reference ingests LibriSpeech ``.flac`` via soundfile
(/root/reference/data/data_loader.py:20-31); this framework decodes FLAC
itself (wav2letter_pytorch_tpu/data/flac.py + native/flac.cpp).  Every
decoder code path is steered explicitly through the encoder's force knobs.
"""

import numpy as np
import pytest

from wav2letter_pytorch_tpu.data import audio_io, flac, flac_native


def _sine(n=20000, amp=9000, sr=16000):
    t = np.arange(n)
    return np.round(amp * np.sin(2 * np.pi * 523 * t / sr)
                    + 0.4 * amp * np.sin(2 * np.pi * 97 * t / sr)).astype(np.int64)


def _roundtrip(x, sr=16000, bps=16, **kw):
    """Encode -> decode (Python, CRC+MD5 verified) -> exact-equality check.

    Cross-checks the native C++ decoder bit-exactly when available."""
    x = np.asarray(x)
    data = flac.encode_flac(x, sr, bps, **kw)
    dec, info = flac.decode_flac(data, verify_crc=True, verify_md5=True)
    want = x[:, None] if x.ndim == 1 else x
    assert info.sample_rate == sr and info.bits_per_sample == bps
    assert dec.shape == want.shape
    np.testing.assert_array_equal(dec, want)
    if flac_native.native_available():
        ns, nsr, nbps = flac_native.decode_native(data)
        assert (nsr, nbps) == (sr, bps)
        np.testing.assert_array_equal(ns, want)
    return data


def test_roundtrip_tonal_and_noise():
    _roundtrip(_sine())
    _roundtrip(np.random.default_rng(0).integers(-32768, 32768, size=13000))


def test_roundtrip_constant_and_silence():
    _roundtrip(np.full(5000, 123))
    _roundtrip(np.zeros(4096, dtype=np.int64))


@pytest.mark.parametrize('mode', ['independent', 'left_side', 'right_side',
                                  'mid_side', 'auto'])
def test_roundtrip_stereo_decorrelation(mode):
    x = _sine(9000)
    st = np.stack([x, np.roll(x, 3) // 2 + 5], axis=1)
    _roundtrip(st, stereo_mode=mode)


@pytest.mark.parametrize('force', ['constant', 'verbatim', 'fixed', 'lpc'])
def test_roundtrip_each_subframe_type(force):
    x = np.full(9000, 3) if force == 'constant' else _sine(9000)
    _roundtrip(x, force_subframe=force)


def test_roundtrip_rice_escape_partitions():
    noise = np.random.default_rng(1).integers(-32768, 32768, size=4096)
    _roundtrip(noise, force_escape=True)
    _roundtrip(_sine(4096), partition_order=0)
    _roundtrip(_sine(4096), partition_order=4)


def test_roundtrip_wasted_bits():
    data = _roundtrip((_sine(5000) // 16) * 16)
    # the encoder must actually have used wasted bits for this to count
    dec, _ = flac.decode_flac(data)
    assert np.all(dec % 16 == 0)


@pytest.mark.parametrize('bps', [8, 12, 16, 24])
def test_roundtrip_bit_depths(bps):
    rng = np.random.default_rng(bps)
    lim = 1 << (bps - 1)
    _roundtrip(rng.integers(-lim, lim, size=3000), bps=bps)


def test_roundtrip_blocking_and_rates():
    _roundtrip(_sine(), variable_blocksize=True)
    _roundtrip(_sine(), blocksize=1000)   # non-standard blocksize code
    _roundtrip(_sine(3000), sr=12345)     # 16-bit Hz sample-rate code
    _roundtrip(_sine(3000), sr=44100)
    _roundtrip(np.array([5, -3, 2]))      # shorter than any predictor order


def test_high_lpc_order():
    _roundtrip(_sine(), lpc_order=20)


def test_crc_detects_corruption():
    data = bytearray(_roundtrip(_sine(4096)))
    data[-100] ^= 0x40  # flip a bit inside the last frame's payload
    with pytest.raises(ValueError):
        flac.decode_flac(bytes(data), verify_crc=True)
    if flac_native.native_available():
        with pytest.raises(ValueError):
            flac_native.decode_native(bytes(data), verify_crc=True)


def test_md5_check():
    data = _roundtrip(_sine(4096))
    flac.decode_flac(data, verify_md5=True)  # passes on intact stream


def test_info_parsers_agree():
    data = _roundtrip(_sine(7000), sr=8000)
    info = flac.read_flac_info(data)
    assert (info.sample_rate, info.channels, info.total_samples) == (8000, 1, 7000)
    if flac_native.native_available():
        ninfo = flac_native.parse_info_native(data)
        assert ninfo['sample_rate'] == 8000
        assert ninfo['total_samples'] == 7000
        assert ninfo['channels'] == 1


def test_audio_io_reads_flac(tmp_path):
    x = _sine(16000)
    path = str(tmp_path / 'a.flac')
    flac.write_flac_file(path, x, 16000)
    samples, rate = audio_io.read_audio(path)
    assert rate == 16000 and samples.dtype == np.float32
    np.testing.assert_allclose(samples, x / 32768.0, atol=1e-7)
    assert audio_io.audio_info(path) == (16000, 16000)


def test_audio_io_flac_offset_duration(tmp_path):
    x = _sine(32000)
    path = str(tmp_path / 'b.flac')
    flac.write_flac_file(path, x, 16000)
    full, _ = audio_io.read_audio(path)
    sliced, _ = audio_io.read_audio(path, offset=0.5, duration=0.25)
    np.testing.assert_array_equal(sliced, full[8000:12000])


def test_audio_io_flac_float_input_and_wav_parity(tmp_path):
    """A float signal written as FLAC and as 16-bit WAV reads back identically
    (both quantize to int16)."""
    rng = np.random.default_rng(2)
    x = np.clip(rng.normal(0, 0.1, 16000), -1, 1).astype(np.float32)
    fpath, wpath = str(tmp_path / 'c.flac'), str(tmp_path / 'c.wav')
    pcm = np.clip(np.round(x * 32768), -32768, 32767).astype(np.int64)
    flac.write_flac_file(fpath, pcm, 16000)
    audio_io.write_wav(wpath, x, 16000)
    f, _ = audio_io.read_audio(fpath)
    w, _ = audio_io.read_audio(wpath)
    np.testing.assert_allclose(f, w, atol=1.0 / 32768)


def test_native_matches_python_on_fuzz():
    """Randomized encoder settings: native and Python decoders agree bit-exactly."""
    if not flac_native.native_available():
        pytest.skip('native library unavailable')
    rng = np.random.default_rng(3)
    for trial in range(12):
        n = int(rng.integers(50, 9000))
        kind = trial % 3
        if kind == 0:
            x = rng.integers(-32768, 32768, size=n)
        elif kind == 1:
            x = np.round(12000 * np.sin(2 * np.pi * rng.uniform(50, 4000)
                                        * np.arange(n) / 16000)).astype(np.int64)
        else:
            x = np.cumsum(rng.integers(-50, 51, size=n))
            x = np.clip(x, -32768, 32767)
        if trial % 4 == 0 and n > 10:
            x = np.stack([x, np.roll(x, 1)], axis=1)
        bs = int(rng.choice([192, 576, 1024, 4096, 1000]))
        data = flac.encode_flac(x, 16000, 16, blocksize=bs,
                                lpc_order=int(rng.integers(1, 16)),
                                variable_blocksize=bool(rng.integers(2)))
        py, _ = flac.decode_flac(data)
        ns, _, _ = flac_native.decode_native(data)
        np.testing.assert_array_equal(py, ns)
        want = x[:, None] if x.ndim == 1 else x
        np.testing.assert_array_equal(py, want)


def test_native_encoder_roundtrip():
    """The C++ fixed-predictor encoder's streams decode exactly in both
    decoders (incl. MD5 verification of its STREAMINFO digest)."""
    if not flac_native.native_available():
        pytest.skip('native library unavailable')
    rng = np.random.default_rng(4)
    cases = [
        _sine(), rng.integers(-32768, 32768, 20000), np.full(5000, -3),
        np.zeros(100, np.int64), np.array([1, 2, 3]),
        np.stack([_sine(9000), np.roll(_sine(9000), 2)], axis=1),
    ]
    for x in cases:
        data = flac_native.encode_native(x, 16000)
        py, _ = flac.decode_flac(data, verify_crc=True, verify_md5=True)
        ns, _, _ = flac_native.decode_native(data)
        want = x[:, None] if x.ndim == 1 else x
        np.testing.assert_array_equal(py, want)
        np.testing.assert_array_equal(ns, want)
    data = flac_native.encode_native(_sine(3000), 12345, blocksize=1000)
    _, info = flac.decode_flac(data)
    assert info.sample_rate == 12345


def test_dataset_ingests_flac_manifest(tmp_path):
    """End-to-end: a manifest of .flac files flows through ManifestDataset."""
    import json
    from wav2letter_pytorch_tpu.data.dataset import ManifestDataset
    from wav2letter_pytorch_tpu.data.label_sets import labels_map
    rows = []
    for i in range(3):
        path = str(tmp_path / f'u{i}.flac')
        flac.write_flac_file(path, _sine(8000 + 1000 * i, amp=6000), 16000)
        rows.append({'audio_filepath': path, 'text': 'hello world'})
    manifest = tmp_path / 'm.jsonl'
    manifest.write_text('\n'.join(json.dumps(r) for r in rows))
    audio_conf = {'sample_rate': 16000, 'window_size': 0.02,
                  'window_stride': 0.01, 'window': 'hamming'}
    ds = ManifestDataset(str(manifest), audio_conf,
                         labels_map['english_lowercase'])
    assert len(ds) == 3  # validate_sample_rate already read the FLAC header
    audio, targets, path, text = ds[0]
    assert audio.dtype == np.float32 and len(audio) == 8000
    assert text == 'hello world' and len(targets) == len(text)
    n, _ = ds.sample_meta(1)
    assert n == 9000
