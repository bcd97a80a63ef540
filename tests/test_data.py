"""Data pipeline tests: WAV I/O, manifests, encoding, bucketed batching."""

import json

import numpy as np
import pytest

from wav2letter_pytorch_tpu.data.audio_io import (audio_info, read_audio,
                                                  write_wav)
from wav2letter_pytorch_tpu.data.dataset import (BucketBatchLoader,
                                                 ManifestDataset)

SR = 16000
AUDIO_CONF = {'sample_rate': SR, 'window': 'hamming',
              'window_size': 0.02, 'window_stride': 0.01}


def _tone(seconds, freq=440.0, sr=SR):
    t = np.arange(int(seconds * sr)) / sr
    return (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.fixture
def corpus(tmp_path):
    rows = []
    for i, (dur, text) in enumerate([(1.0, 'hello world'),
                                     (0.5, 'abc'),
                                     (1.5, 'the quick brown fox'),
                                     (0.7, 'jumps over'),
                                     (1.2, 'the lazy dog')]):
        path = tmp_path / f'utt{i}.wav'
        write_wav(str(path), _tone(dur, 300 + 100 * i), SR)
        rows.append({'audio_filepath': str(path), 'text': text})
    manifest = tmp_path / 'manifest.jsonl'
    manifest.write_text('\n'.join(json.dumps(r) for r in rows))
    return manifest, rows


def test_wav_roundtrip(tmp_path):
    path = str(tmp_path / 'a.wav')
    samples = _tone(0.25)
    write_wav(path, samples, SR)
    loaded, rate = read_audio(path)
    assert rate == SR
    assert loaded.shape == samples.shape
    np.testing.assert_allclose(loaded, samples, atol=1e-4)
    frames, rate2 = audio_info(path)
    assert (frames, rate2) == (len(samples), SR)


def test_wav_offset_duration(tmp_path):
    path = str(tmp_path / 'a.wav')
    samples = _tone(1.0)
    write_wav(path, samples, SR)
    seg, _ = read_audio(path, duration=0.25, offset=0.5)
    assert len(seg) == SR // 4
    np.testing.assert_allclose(seg, samples[SR // 2: SR // 2 + SR // 4],
                               atol=1e-4)


def test_manifest_jsonl_and_csv(corpus, tmp_path):
    manifest, rows = corpus
    ds = ManifestDataset(str(manifest), AUDIO_CONF, 'english_lowercase')
    assert len(ds) == 5
    audio, target, path, text = ds[0]
    assert text == 'hello world'
    assert len(audio) == SR  # 1.0s
    assert all(i > 0 for i in target)

    import pandas as pd
    csv_path = tmp_path / 'manifest.csv'
    pd.DataFrame(rows).to_csv(csv_path)  # index written, like prepare script
    ds2 = ManifestDataset(str(csv_path), AUDIO_CONF, 'english_lowercase')
    assert len(ds2) == 5
    assert ds2[2][3] == 'the quick brown fox'


def test_cache_audio_skips_redecode(corpus, monkeypatch):
    """cache_audio=True: first access decodes, repeats are served from RAM
    with identical samples; default (off) re-decodes every access."""
    manifest, _ = corpus
    import wav2letter_pytorch_tpu.data.dataset as dsmod
    calls = {'n': 0}
    real = dsmod.read_audio

    def counting(*a, **k):
        calls['n'] += 1
        return real(*a, **k)

    monkeypatch.setattr(dsmod, 'read_audio', counting)
    ds = ManifestDataset(str(manifest), AUDIO_CONF, 'english_lowercase',
                         cache_audio=True)
    first = ds[0][0]
    n_after_first = calls['n']
    again = ds[0][0]
    assert calls['n'] == n_after_first  # no second decode
    np.testing.assert_array_equal(first, again)

    ds_nocache = ManifestDataset(str(manifest), AUDIO_CONF,
                                 'english_lowercase')
    base = calls['n']
    ds_nocache[0], ds_nocache[0]
    assert calls['n'] == base + 2  # default path re-decodes


def test_int16_wire_dtype_bit_exact(corpus):
    """audio_dtype='int16': batches carry PCM ints at half the bytes, and
    the on-device frontend's /2**15 rescale reproduces the f32 pipeline's
    samples bit-exactly for 16-bit sources."""
    manifest, _ = corpus
    ds_f32 = ManifestDataset(str(manifest), AUDIO_CONF, 'english_lowercase')
    ds_i16 = ManifestDataset(str(manifest), AUDIO_CONF, 'english_lowercase',
                             audio_dtype='int16')
    a32 = ds_f32[0][0]
    a16 = ds_i16[0][0]
    assert a16.dtype == np.int16
    np.testing.assert_array_equal(a16.astype(np.float32) / 32768.0, a32)

    lo32 = BucketBatchLoader(ds_f32, 2, num_buckets=1, shuffle=False,
                             prefetch=0)
    lo16 = BucketBatchLoader(ds_i16, 2, num_buckets=1, shuffle=False,
                             prefetch=0)
    b32, b16 = lo32.peek_batch(), lo16.peek_batch()
    assert b16['audio'].dtype == np.int16
    assert b16['audio'].nbytes * 2 == b32['audio'].nbytes

    from wav2letter_pytorch_tpu.data.features import (AudioConfig,
                                                      SpectrogramFrontend)
    fe = SpectrogramFrontend(AudioConfig(sample_rate=SR), n_mels=13,
                             dither=0.0)
    f32, l32 = fe(b32['audio'], b32['audio_lengths'])
    f16, l16 = fe(b16['audio'], b16['audio_lengths'])
    np.testing.assert_array_equal(np.asarray(l32), np.asarray(l16))
    np.testing.assert_array_equal(np.asarray(f32), np.asarray(f16))


def test_encode_text_drops_unknown(corpus):
    manifest, _ = corpus
    ds = ManifestDataset(str(manifest), AUDIO_CONF, 'english_lowercase')
    # '5' and '!' are not labels; uppercase 'Q' is not in lowercase set
    encoded = ds.encode_text('a5b!Q c')
    decoded = ''.join(ds.labels[i] for i in encoded)
    assert decoded == 'ab c'


def test_sample_rate_validation(corpus, tmp_path):
    manifest, rows = corpus
    bad_conf = dict(AUDIO_CONF, sample_rate=8000)
    with pytest.raises(AssertionError, match='sample rate'):
        ManifestDataset(str(manifest), bad_conf, 'english_lowercase')


def test_bucket_loader_static_shapes(corpus):
    manifest, _ = corpus
    ds = ManifestDataset(str(manifest), AUDIO_CONF, 'english_lowercase')
    loader = BucketBatchLoader(ds, batch_size=2, num_buckets=2, shuffle=False,
                               prefetch=0)
    batches = list(loader)
    assert sum(int(b['batch_mask'].sum()) for b in batches) == 5
    shapes = {b['audio'].shape for b in batches}
    # static shapes: at most num_buckets distinct audio widths
    assert len({s[1] for s in shapes}) <= 2
    for b in batches:
        assert b['audio'].shape[0] == 2
        assert b['targets'].shape == (2, b['targets'].shape[1])
        assert (b['audio_lengths'] <= b['audio'].shape[1]).all()
        # every valid row's target length matches its text
        for j, text in enumerate(b['texts']):
            assert b['target_lengths'][j] == len(ds.encode_text(text))


def test_bucket_loader_shuffle_and_prefetch(corpus):
    manifest, _ = corpus
    ds = ManifestDataset(str(manifest), AUDIO_CONF, 'english_lowercase')
    loader = BucketBatchLoader(ds, batch_size=2, num_buckets=2, shuffle=True,
                               seed=1, prefetch=2)
    e1 = [b['texts'] for b in loader]
    e2 = [b['texts'] for b in loader]
    assert sum(len(t) for t in e1) == sum(len(t) for t in e2) == 5
    assert e1 != e2  # different epoch -> different shuffle


def test_bucket_loader_max_duration(corpus):
    manifest, _ = corpus
    ds = ManifestDataset(str(manifest), AUDIO_CONF, 'english_lowercase')
    loader = BucketBatchLoader(ds, batch_size=5, num_buckets=1,
                               max_duration=0.8, shuffle=False, prefetch=0)
    (batch,) = list(loader)
    assert batch['audio'].shape[1] <= int(0.8 * SR) + 1280
    assert (batch['audio_lengths'] <= batch['audio'].shape[1]).all()


def test_bucket_top_edge_tracks_data_not_cap(corpus):
    """max_duration is a cap, not a floor: with a corpus far shorter than
    the cap, batches must pad to the observed max (+ rounding slack), not
    to the cap — padding to the cap silently multiplied train-step compute
    by cap/data-max (4.5x observed on a 3.5s-max corpus with the default
    16.7s cap)."""
    manifest, _ = corpus
    ds = ManifestDataset(str(manifest), AUDIO_CONF, 'english_lowercase')
    data_max = max(ds.sample_meta(i)[0] for i in range(len(ds)))
    loader = BucketBatchLoader(ds, batch_size=5, num_buckets=1,
                               max_duration=16.7, shuffle=False, prefetch=0,
                               frame_hop=160)
    assert loader.bucket_edges[-1] < data_max + 8 * 160 + 160
    (batch,) = list(loader)
    assert batch['audio'].shape[1] == loader.bucket_edges[-1]


def test_loader_sharding_disjoint_and_complete(corpus):
    """Multi-host sharding: two shards cover disjoint samples whose union is
    the full dataset (DistributedSampler-equivalent)."""
    manifest, _ = corpus
    ds = ManifestDataset(str(manifest), AUDIO_CONF, 'english_lowercase')
    seen = {}
    for shard in (0, 1):
        loader = BucketBatchLoader(ds, batch_size=2, num_buckets=1,
                                   shuffle=True, seed=7, prefetch=0,
                                   shard_id=shard, num_shards=2)
        texts = []
        for b in loader:
            for j, t in enumerate(b['texts']):
                if b['batch_mask'][j]:
                    texts.append(t)
        seen[shard] = texts
        assert len(loader) >= 1
    all_texts = seen[0] + seen[1]
    assert len(all_texts) == 5
    assert sorted(all_texts) == sorted(
        ds.df.text.tolist())


def test_prefetch_worker_errors_propagate(corpus, tmp_path):
    """Exceptions in the prefetch thread must surface, not end iteration."""
    import os
    manifest, rows = corpus
    ds = ManifestDataset(str(manifest), AUDIO_CONF, 'english_lowercase')
    loader = BucketBatchLoader(ds, batch_size=2, num_buckets=1, prefetch=2)
    # Delete an audio file after length scanning -> read fails mid-epoch.
    os.remove(rows[0]['audio_filepath'])
    with pytest.raises(FileNotFoundError):
        list(loader)


def test_frame_aligned_bucket_edges(corpus):
    """With frame_hop set, every bucket edge yields frame counts ≡ 0 mod 8."""
    manifest, _ = corpus
    ds = ManifestDataset(str(manifest), AUDIO_CONF, 'english_lowercase')
    loader = BucketBatchLoader(ds, batch_size=2, num_buckets=3, prefetch=0,
                               frame_hop=160)
    for edge in loader.bucket_edges:
        assert (1 + edge // 160) % 8 == 0, edge
    # edges still cover the longest sample
    assert max(loader.bucket_edges) >= loader.lengths.max()
    total = sum(int(b['batch_mask'].sum()) for b in loader)
    assert total == 5


def test_peek_batch_preserves_epoch_and_threads(corpus):
    """peek_batch must not consume the epoch counter (shuffle orders shift
    off by one) nor start a prefetch worker (leaked thread per peek)."""
    import threading
    manifest, _ = corpus
    ds = ManifestDataset(str(manifest), AUDIO_CONF, 'english_lowercase')
    loader = BucketBatchLoader(ds, batch_size=2, num_buckets=2, shuffle=True,
                               seed=3, prefetch=2)
    n_threads = threading.active_count()
    peeked = loader.peek_batch()
    assert peeked is not None and peeked['audio'].shape[0] == 2
    assert loader.epoch == 0
    assert threading.active_count() == n_threads
    # The first real epoch yields the same first batch the peek saw.
    first_real = next(iter(loader))
    assert first_real['texts'] == peeked['texts']
