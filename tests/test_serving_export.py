"""Serving artifact export/load round trip + corpus CMVN measurement."""

import json

import numpy as np
import pytest

from wav2letter_pytorch_tpu.data.features import (AudioConfig,
                                                  SpectrogramFrontend)
from wav2letter_pytorch_tpu.serving import (StreamingWav2Letter,
                                            compute_cmvn, export_serving,
                                            load_serving)
from tests.test_streaming import N_MELS, SMALL_LAYERS, _build, _run_stream


@pytest.fixture(scope='module')
def small():
    return _build(SMALL_LAYERS)


@pytest.mark.parametrize('weights', ['f32', 'int8'])
def test_export_load_roundtrip_streaming(small, tmp_path, weights):
    """A session built from the loaded artifact reproduces the session
    built from live variables."""
    model, variables, frontend = small
    out = export_serving(str(tmp_path / 'art'), SMALL_LAYERS, 7, variables,
                         labels=list('_abcde '),
                         audio_conf={'sample_rate': 16000,
                                     'window_size': 0.02,
                                     'window_stride': 0.01,
                                     'window': 'hamming'},
                         weights=weights)
    meta, folded, norm_stats = load_serving(out)
    assert meta['format'] == weights and meta['labels'][0] == '_'
    assert norm_stats is None

    stats = (np.zeros(N_MELS, np.float32), np.ones(N_MELS, np.float32))
    fe = SpectrogramFrontend(AudioConfig(), n_mels=N_MELS, dither=0.0)
    kw = dict(chunk_frames=16, norm='precomputed', norm_stats=stats)
    sw_live = StreamingWav2Letter(SMALL_LAYERS, 7, variables, fe,
                                  weights=weights, **kw)
    sw_art = StreamingWav2Letter(meta['layers'], meta['num_labels'], None,
                                 fe, folded=folded, **kw)
    length = sw_live.prime_samples + sw_live.chunk_samples + 1000
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((1, length)) * 0.1).astype(np.float32)
    a, va = _run_stream(sw_live, audio, np.array([length]))
    b, vb = _run_stream(sw_art, audio, np.array([length]))
    assert int(va[0]) == int(vb[0])
    np.testing.assert_allclose(a[0, :int(va[0])], b[0, :int(vb[0])],
                               atol=1e-6)


def test_export_with_cmvn(small, tmp_path):
    model, variables, frontend = small
    stats = (np.full(N_MELS, 0.5, np.float32), np.full(N_MELS, 2.0,
                                                       np.float32))
    out = export_serving(str(tmp_path / 'art'), SMALL_LAYERS, 7, variables,
                         norm_stats=stats)
    meta, folded, loaded_stats = load_serving(out)
    assert meta['has_cmvn']
    np.testing.assert_array_equal(loaded_stats[0], stats[0])
    np.testing.assert_array_equal(loaded_stats[1], stats[1])
    with open(out + '/serving.json') as f:
        assert json.load(f)['num_labels'] == 7


def test_compute_cmvn(tmp_path):
    """CMVN over a synthetic manifest: finite stats, positive std, and a
    frontend built with them normalizes the corpus to ~zero-mean/unit-std."""
    from tests.test_train_e2e import _make_corpus
    manifest = _make_corpus(tmp_path)
    audio_conf = {'sample_rate': 16000, 'window_size': 0.02,
                  'window_stride': 0.01, 'window': 'hamming'}

    def factory(normalize=True):
        return SpectrogramFrontend(AudioConfig(), n_mels=N_MELS, dither=0.0,
                                   normalize=normalize)

    labels = ['_'] + list("abcdefghijklmnopqrstuvwxyz' ")
    mean, std = compute_cmvn(manifest, factory, labels, audio_conf)
    assert mean.shape == (N_MELS,) and std.shape == (N_MELS,)
    assert np.all(np.isfinite(mean)) and np.all(std > 0)

    # Re-extract with the measured stats: corpus-aggregate mean ~0, std ~1.
    fe = SpectrogramFrontend(AudioConfig(), n_mels=N_MELS, dither=0.0,
                             norm_stats=(mean, std))
    from wav2letter_pytorch_tpu.data.dataset import ManifestDataset
    ds = ManifestDataset(manifest, audio_conf, labels)
    allf = []
    for i in range(len(ds)):
        audio = np.asarray(ds[i][0], np.float32)[None, :]
        feats, flens = fe(audio, np.array([audio.shape[1]]))
        allf.append(np.asarray(feats)[0, :int(flens[0])])
    allf = np.concatenate(allf, axis=0)
    assert abs(float(allf.mean())) < 0.05
    assert abs(float(allf.std()) - 1.0) < 0.05


def test_export_cli(tmp_path):
    """scripts/export_serving.py end to end on a freshly trained run."""
    from tests.test_train_e2e import _make_corpus
    manifest = _make_corpus(tmp_path)
    run_dir = tmp_path / 'run'
    import train as train_cli
    rc = train_cli.main([
        f'data.train_manifest={manifest}',
        f'data.val_manifest={manifest}',
        'data.batch_size=2', 'data.num_length_buckets=1',
        'model.input_size=32',
        'model.layers=[{output_size: 24, kernel_size: 7, stride: 2, '
        'dilation: 1, dropout: 0.1}]',
        'trainer.max_epochs=1', 'trainer.max_steps=2',
        'trainer.string_metrics_interval=0', 'trainer.mesh.data=2',
        f'trainer.default_root_dir={run_dir}',
    ])
    assert rc == 0
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        'export_serving',
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     'scripts', 'export_serving.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # Bundle a trained LM into the artifact (a complete deployment).
    lm_path = tmp_path / 'lm.arpa'
    from wav2letter_pytorch_tpu.decoding.ngram_train import train_arpa
    with open(manifest) as f:
        texts = [json.loads(ln)['text'] for ln in f if ln.strip()]
    train_arpa(texts, str(lm_path), order=2)
    art = tmp_path / 'artifact'
    rc = mod.main(['--model-path', str(run_dir), '--out', str(art),
                   '--int8', '--cmvn-manifest', manifest, '--calibrate',
                   '--lm-path', str(lm_path),
                   '--lm-beam-params', 'k=4,alpha=0.3,beta=0'])
    assert rc == 0
    meta, folded, norm_stats = load_serving(str(art))
    assert meta['format'] == 'int8'
    assert meta['lm'] == {'file': 'lm.arpa',
                          'beam_params': {'k': 4, 'alpha': 0.3, 'beta': 0.0}}
    assert (art / 'lm.arpa').exists()
    assert norm_stats is not None and np.all(norm_stats[1] > 0)
    assert len(folded) == 2  # 1 block + head
    assert folded[0][0].dtype == np.int8
    assert len(meta['act_scales']) == 2
    assert all(s > 0 for s in meta['act_scales'])

    # Evaluate the artifact directly (no checkpoint) via test.py.
    import io, contextlib
    import test as test_cli
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = test_cli.main(['--artifact', str(art),
                            '--test-manifest', manifest,
                            '--streaming-chunk-frames', '8'])
    assert rc == 0
    result = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert result['weights'] == 'int8' and 'wer' in result
    assert result['skipped_below_prime'] < result['num_utterances']

    # Batched mesh-sharded offline eval of the same artifact.
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = test_cli.main(['--artifact', str(art),
                            '--test-manifest', manifest,
                            '--offline', '--int8-full'])
    assert rc == 0
    result = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert result['offline'] is True and result['weights'] == 'int8_full'
    assert result['mesh_devices'] == 8 and 'wer' in result
    # The bundled LM + beam params were picked up automatically...
    assert result['decode'] == 'beam_lm'
    # ... and --no-lm opts back out to greedy.
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = test_cli.main(['--artifact', str(art),
                            '--test-manifest', manifest,
                            '--offline', '--no-lm'])
    assert rc == 0
    result = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert result['decode'] == 'greedy'

    # Same trained run through the streaming demo CLI (synthetic feed).
    spec = importlib.util.spec_from_file_location(
        'stream_demo',
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     'scripts', 'stream_demo.py'))
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)
    rc = demo.main(['--model-path', str(run_dir), '--synthetic', '3',
                    '--chunk-frames', '8'])
    assert rc == 0
