"""benchmarks/beam_sweep.py: decode-hyperparameter grid over cached logprobs.

Tuning tooling for the beam/LM knobs the reference exposes but never tunes
(/root/reference/decoder.py:235-257, README.md:46-56). The expensive
acoustic forward must run once per split, with the whole (lm, k, alpha,
beta) grid decoded host-side from the cached probability matrices.
"""

import importlib.util
import json
import os

import pytest

from tests.test_train_e2e import _make_corpus


def _load(name, relpath):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope='module')
def artifact_and_lm(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp('sweep')
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
        'trainer.max_epochs=1', 'trainer.max_steps=3',
        'trainer.string_metrics_interval=0', 'trainer.mesh.data=2',
        f'trainer.default_root_dir={run_dir}',
    ])
    assert rc == 0
    art = str(tmp_path / 'art')
    rc = _load('export_serving_cli', 'scripts/export_serving.py').main(
        ['--model-path', str(run_dir), '--out', art])
    assert rc == 0
    lm_path = str(tmp_path / 'lm.arpa')
    rc = _load('build_arpa_cli', 'scripts/build_arpa.py').main(
        ['--manifest', manifest, '--out', lm_path, '--order', '2'])
    assert rc == 0
    return art, lm_path, manifest


def test_beam_sweep_grid(artifact_and_lm, tmp_path):
    art, lm_path, manifest = artifact_and_lm
    out = str(tmp_path / 'sweep.json')
    sweep = _load('beam_sweep', 'benchmarks/beam_sweep.py')
    rc = sweep.main(['--artifact', art,
                     '--val-manifest', manifest,
                     '--test-manifest', manifest,
                     '--lm', '', '--lm', lm_path,
                     '--ks', '2,4', '--alphas', '0.3,0.5', '--betas', '0,1',
                     '--out', out])
    assert rc == 0
    with open(out) as f:
        rec = json.load(f)
    # no-LM rows collapse the alpha axis: 2k x 2beta; LM rows: 2k x 2a x 2b
    no_lm = [r for r in rec['grid'] if not r['lm']]
    with_lm = [r for r in rec['grid'] if r['lm']]
    assert len(no_lm) == 4 and len(with_lm) == 8
    best = rec['best']
    assert best['val_wer'] == min(r['val_wer'] for r in rec['grid'])
    # winner was scored on the test manifest with both decode modes
    # (a 3-step model's WER ratio can exceed 1 via insertions)
    assert 0 <= rec['test_wer'] < 10 and 0 <= rec['greedy_test_wer'] < 10
    assert rec['n_val'] == rec['n_test'] == 6
    # the sweep's selected point must reproduce through the shipped
    # decoder construction (same numbers a user would get via test.py)
    from wav2letter_pytorch_tpu.decoding import PrefixBeamSearchLMDecoder
    from wav2letter_pytorch_tpu.serving import load_serving
    meta, _, _ = load_serving(art)
    labels, cached = sweep.collect_logprobs(art, manifest, False,
                                            'per-utterance')
    assert labels == meta['labels']
    dec = PrefixBeamSearchLMDecoder(best['lm'], labels, k=best['k'],
                                    alpha=best['alpha'], beta=best['beta'])
    r = sweep.eval_grid_point(dec, cached)
    val_match = [x for x in rec['grid'] if x == best]
    assert val_match and abs(r['wer'] - best['val_wer']) < 1e-12
