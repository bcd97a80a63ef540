"""test.py offline evaluation CLI: checkpoint load, greedy + beam decoding.

This is the surface the reference README promises but never implemented
(README.md:46-56 'WIP!').
"""

import json

import pytest

from tests.test_train_e2e import _make_corpus


@pytest.fixture(scope='module')
def trained_run(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp('evalrun')
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
        'trainer.string_metrics_interval=0',
        'trainer.mesh.data=2',
        f'trainer.default_root_dir={run_dir}',
    ])
    assert rc == 0
    return str(run_dir), manifest


def test_eval_cli_greedy(trained_run, capsys):
    run_dir, manifest = trained_run
    import test as test_cli
    rc = test_cli.main(['--model-path', run_dir,
                        '--test-manifest', manifest,
                        '--print-samples'])
    assert rc == 0
    out = capsys.readouterr().out
    result = json.loads(out.strip().splitlines()[-1])
    assert set(result) >= {'loss', 'wer', 'cer', 'num_utterances'}
    assert result['num_utterances'] == 6
    assert result['loss'] is not None
    assert 'reference:' in out  # --print-samples produced pairs


def test_eval_cli_beam_search(trained_run, capsys):
    run_dir, manifest = trained_run
    import test as test_cli
    rc = test_cli.main(['--model-path', run_dir,
                        '--test-manifest', manifest,
                        '--beam-search-params', 'k=3,alpha=0.3,beta=1,prune=1e-3'])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 'wer' in result


def test_eval_cli_streaming(trained_run, capsys):
    """--streaming evaluates through the chunked serving path."""
    run_dir, manifest = trained_run
    import test as test_cli
    rc = test_cli.main(['--model-path', run_dir,
                        '--test-manifest', manifest,
                        '--streaming', '--streaming-chunk-frames', '8',
                        '--word-timings'])
    assert rc == 0
    out = capsys.readouterr().out
    result = json.loads(out.strip().splitlines()[-1])
    assert result['streaming'] is True
    assert result['num_utterances'] == 6
    assert result['offline_fallback'] == 0   # all utterances streamed
    assert 'wer' in result and 'cer' in result
    assert 'timings' in out


def test_eval_cli_streaming_cmvn_norm(trained_run, capsys):
    """--streaming-norm cmvn: precomputed corpus CMVN replaces cumulative
    normalization in the streamers (the deployment-standard stats;
    training normalized per-utterance — reference data_loader.py:77-88)."""
    run_dir, manifest = trained_run
    import test as test_cli
    rc = test_cli.main(['--model-path', run_dir,
                        '--test-manifest', manifest,
                        '--streaming', '--streaming-chunk-frames', '8',
                        '--streaming-norm', 'cmvn',
                        '--streaming-cmvn-manifest', manifest,
                        '--streaming-cmvn-limit', '4'])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result['streaming'] is True
    assert result['normalization'] == 'cmvn'
    assert result['num_utterances'] == 6
    assert 'wer' in result and 'cer' in result
    # Requiring the manifest keeps eval-data stats out by default.
    with pytest.raises(SystemExit):
        test_cli.main(['--model-path', run_dir,
                       '--test-manifest', manifest,
                       '--streaming', '--streaming-norm', 'cmvn'])
    capsys.readouterr()


def test_eval_cli_bounded_lookahead_cmvn_norm(trained_run, capsys):
    """Bounded-lookahead mode honours --streaming-norm cmvn too."""
    run_dir, manifest = trained_run
    import test as test_cli
    rc = test_cli.main(['--model-path', run_dir,
                        '--test-manifest', manifest,
                        '--streaming', '--streaming-chunk-frames', '8',
                        '--lookahead-frames', '8',
                        '--streaming-norm', 'cmvn',
                        '--streaming-cmvn-manifest', manifest,
                        '--streaming-cmvn-limit', '4'])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result['normalization'] == 'cmvn'
    assert result['bounded_lookahead_frames'] >= 8
    assert 'wer' in result


def test_eval_cli_bounded_lookahead(trained_run, capsys):
    """--streaming --lookahead-frames N: bounded-lookahead commit mode
    (serving/lookahead.py) reports its latency knobs alongside WER."""
    run_dir, manifest = trained_run
    import test as test_cli
    rc = test_cli.main(['--model-path', run_dir,
                        '--test-manifest', manifest,
                        '--streaming', '--streaming-chunk-frames', '8',
                        '--lookahead-frames', '8'])
    assert rc == 0
    out = capsys.readouterr().out
    result = json.loads(out.strip().splitlines()[-1])
    assert result['streaming'] is True
    assert result['bounded_lookahead_frames'] >= 8
    assert result['num_utterances'] == 6
    assert 'wer' in result and 'cer' in result


def test_eval_cli_streaming_int8(trained_run, capsys):
    run_dir, manifest = trained_run
    import test as test_cli
    rc = test_cli.main(['--model-path', run_dir,
                        '--test-manifest', manifest,
                        '--streaming', '--streaming-chunk-frames', '8',
                        '--int8'])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result['weights'] == 'int8'
    assert 'wer' in result


def test_beam_param_parsing():
    import test as test_cli
    params = test_cli.parse_beam_params('k=8,alpha=0.5,beta=2,prune=1e-4')
    assert params == {'k': 8, 'alpha': 0.5, 'beta': 2.0, 'prune': 1e-4}
    with pytest.raises(ValueError):
        test_cli.parse_beam_params('bogus=1')


def test_resume_from_checkpoint(trained_run, tmp_path):
    """--resume restores the saved step and continues."""
    run_dir, manifest = trained_run
    import train as train_cli
    rc = train_cli.main([
        f'data.train_manifest={manifest}',
        f'data.val_manifest={manifest}',
        'data.batch_size=2', 'data.num_length_buckets=1',
        'model.input_size=32',
        'model.layers=[{output_size: 24, kernel_size: 7, stride: 2, '
        'dilation: 1, dropout: 0.1}]',
        'trainer.max_epochs=1', 'trainer.max_steps=5',
        'trainer.string_metrics_interval=0',
        'trainer.mesh.data=2',
        f'trainer.default_root_dir={run_dir}',
        '--resume',
    ])
    assert rc == 0
    from wav2letter_pytorch_tpu.training.checkpoint import Checkpointer
    ckpt = Checkpointer(f'{run_dir}/checkpoints')
    assert ckpt.latest_step() >= 3


def test_eval_cli_word_timings(trained_run, capsys):
    run_dir, manifest = trained_run
    import test as test_cli
    rc = test_cli.main(['--model-path', run_dir,
                        '--test-manifest', manifest,
                        '--word-timings', '--print-all'])
    assert rc == 0
    out = capsys.readouterr().out
    assert 'timings  :' in out
    # beam decoding also yields timings (forced-alignment offsets — the
    # reference's beam search raises NotImplementedError for offsets)
    rc = test_cli.main(['--model-path', run_dir,
                        '--test-manifest', manifest,
                        '--beam-search-params', 'k=4,beta=2,prune=1e-3',
                        '--word-timings', '--print-all'])
    assert rc == 0
    assert 'timings  :' in capsys.readouterr().out


def test_eval_cli_device_beam(trained_run, capsys):
    run_dir, manifest = trained_run
    import test as test_cli
    rc = test_cli.main(['--model-path', run_dir,
                        '--test-manifest', manifest,
                        '--beam-backend', 'device',
                        '--beam-search-params', 'k=4,beta=2,prune=1e-3'])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 'wer' in result and result['num_utterances'] == 6


def test_eval_cli_dump_and_error_analysis(trained_run, tmp_path, capsys):
    """--dump-jsonl feeds scripts/error_analysis.py: per-utterance records
    with edit counts consistent with the corpus WER."""
    import importlib.util
    import os

    run_dir, manifest = trained_run
    dump = str(tmp_path / 'utts.jsonl')
    import test as test_cli
    rc = test_cli.main(['--model-path', run_dir,
                        '--test-manifest', manifest,
                        '--dump-jsonl', dump])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    with open(dump) as f:
        recs = [json.loads(l) for l in f if l.strip()]
    assert len(recs) == result['num_utterances'] == 6
    assert all(set(r) == {'path', 'ref', 'hyp', 'wer_edits', 'ref_words',
                          'cer_edits', 'ref_chars'} for r in recs)
    # dump edit counts reproduce the corpus ratio exactly
    assert sum(r['wer_edits'] for r in recs) / \
        sum(r['ref_words'] for r in recs) == result['wer']

    spec = importlib.util.spec_from_file_location(
        'error_analysis',
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     'scripts', 'error_analysis.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    report = str(tmp_path / 'report.json')
    rc = mod.main([dump, '--worst', '3', '--json-out', report])
    assert rc == 0
    with open(report) as f:
        rep = json.load(f)
    assert rep['num_utterances'] == 6
    assert len(rep['worst_utterances']) == 3
    # alignment-based WER must equal the eval's corpus WER
    assert abs(rep['wer'] - result['wer']) < 1e-12


def test_eval_cli_hotwords(trained_run, capsys):
    """--hotwords implies beam decoding with contextual biasing, on both
    the host and the device backends (identical corpus metrics — the
    device search is string-exact vs the host DP)."""
    run_dir, manifest = trained_run
    import test as test_cli
    rc = test_cli.main(['--model-path', run_dir,
                        '--test-manifest', manifest,
                        '--hotwords', 'aba,cab', '--hotword-weight', '1.5'])
    assert rc == 0
    host = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 'wer' in host
    rc = test_cli.main(['--model-path', run_dir,
                        '--test-manifest', manifest,
                        '--hotwords', 'aba,cab', '--hotword-weight', '1.5',
                        '--beam-backend', 'device'])
    assert rc == 0
    dev = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert dev['wer'] == host['wer'] and dev['cer'] == host['cer']
