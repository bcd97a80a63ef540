"""End-to-end training smoke tests on a synthetic WAV corpus.

Covers the reference's only integration path (examples/librispeech.sh: train
one epoch end to end) without network access: generated tone WAVs, the full
config -> loaders -> jitted train step -> metrics -> checkpoint pipeline.
"""

import json
import os

import numpy as np
import pytest

from wav2letter_pytorch_tpu.data.audio_io import write_wav

SR = 16000


def _make_corpus(tmp_path, n=6, seed=0):
    rng = np.random.default_rng(seed)
    texts = ['abba', 'cab', 'dad at bat', 'a cat sat', 'bad cab', 'tact']
    rows = []
    for i in range(n):
        dur = 0.3 + 0.1 * (i % 3)
        t = np.arange(int(dur * SR)) / SR
        audio = (0.3 * np.sin(2 * np.pi * (250 + 60 * i) * t)
                 + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)
        path = tmp_path / f'utt{i}.wav'
        write_wav(str(path), audio, SR)
        rows.append({'audio_filepath': str(path), 'text': texts[i % len(texts)]})
    manifest = tmp_path / 'train.jsonl'
    manifest.write_text('\n'.join(json.dumps(r) for r in rows))
    return str(manifest)


@pytest.fixture
def overrides(tmp_path):
    manifest = _make_corpus(tmp_path)
    run_dir = tmp_path / 'run'
    return [
        f'data.train_manifest={manifest}',
        f'data.val_manifest={manifest}',
        'data.batch_size=2',
        'data.num_length_buckets=1',
        'model.input_size=32',
        'model.mid_layers=1',
        'model.layers=[{output_size: 24, kernel_size: 7, stride: 2, '
        'dilation: 1, dropout: 0.1}]',
        'trainer.max_epochs=1',
        'trainer.max_steps=4',
        'trainer.log_every_n_steps=1',
        'trainer.string_metrics_interval=1',
        'trainer.mesh.data=2',
        f'trainer.default_root_dir={run_dir}',
    ]


def test_train_cli_end_to_end(overrides, tmp_path):
    import train as train_cli
    assert train_cli.main(overrides) == 0
    run_dir = tmp_path / 'run'
    metrics = (run_dir / 'metrics.csv').read_text()
    assert 'train_loss' in metrics
    assert 'train_wer' in metrics
    assert 'val_wer' in metrics
    assert (run_dir / 'checkpoints').exists()


def test_train_cli_config_print(capsys):
    import train as train_cli
    assert train_cli.main(['data.train_manifest=x', 'data.val_manifest=y',
                           '--cfg']) == 0
    out = capsys.readouterr().out
    assert 'train_manifest: x' in out


def test_loss_decreases_when_overfitting(tmp_path):
    """A tiny model on a single repeated utterance must drive CTC loss down."""
    import jax.numpy as jnp
    from wav2letter_pytorch_tpu import optim
    from wav2letter_pytorch_tpu.config import load_config
    from wav2letter_pytorch_tpu.data.dataset import (BucketBatchLoader,
                                                     ManifestDataset)
    from wav2letter_pytorch_tpu.training import (Trainer, build_decoder,
                                                 build_frontend, build_labels,
                                                 build_model)

    manifest = _make_corpus(tmp_path, n=2, seed=1)
    cfg = load_config([
        f'data.train_manifest={manifest}',
        f'data.val_manifest={manifest}',
        'data.batch_size=2', 'data.num_length_buckets=1',
        'model.input_size=32',
        'model.layers=[{output_size: 32, kernel_size: 7, stride: 2, '
        'dilation: 1, dropout: -1.0}]',
        'trainer.string_metrics_interval=0',
        'trainer.mesh.data=2',
        f'trainer.default_root_dir={tmp_path / "run2"}',
    ])
    labels = build_labels(cfg.model)
    ds = ManifestDataset(manifest, cfg.data.audio_conf, labels)
    loader = BucketBatchLoader(ds, 2, num_buckets=1, shuffle=False, prefetch=0)
    model = build_model(cfg.model, len(labels))
    frontend = build_frontend(cfg.model)
    tx = optim.adamw(3e-3, weight_decay=0.0)
    trainer = Trainer(cfg, model, frontend, tx, optim.constant_lr(3e-3),
                      build_decoder(cfg.model, labels),
                      run_dir=str(tmp_path / 'run2'))

    batch = next(iter(loader))
    trainer.init_state(batch)
    step = trainer._get_jitted('train')
    from wav2letter_pytorch_tpu.parallel import shard_batch
    db = shard_batch({k: v for k, v in batch.items()
                      if isinstance(v, np.ndarray)}, trainer.mesh)
    losses = []
    for _ in range(25):
        trainer.state, loss, _, _ = step(trainer.state, db)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses


def test_grad_clip_and_accumulation(tmp_path):
    """trainer.gradient_clip_val / accumulate_grad_batches knobs wire up."""
    manifest = _make_corpus(tmp_path, n=4, seed=2)
    import train as train_cli
    rc = train_cli.main([
        f'data.train_manifest={manifest}',
        f'data.val_manifest={manifest}',
        'data.batch_size=2', 'data.num_length_buckets=1',
        'model.input_size=32',
        'model.layers=[{output_size: 16, kernel_size: 5, stride: 2, '
        'dilation: 1, dropout: -1.0}]',
        'trainer.max_epochs=1', 'trainer.max_steps=2',
        'trainer.string_metrics_interval=0',
        'trainer.mesh.data=2',
        '+trainer.gradient_clip_val=1.0',
        '+trainer.accumulate_grad_batches=2',
        f'trainer.default_root_dir={tmp_path / "run"}',
    ])
    assert rc == 0
    assert 'train_loss' in (tmp_path / 'run' / 'metrics.csv').read_text()


def test_training_is_deterministic(tmp_path):
    """Same seed -> bit-identical loss trajectory (shuffle, dither, dropout
    are all PRNG-keyed on seed and step)."""
    manifest = _make_corpus(tmp_path, n=4, seed=3)
    import train as train_cli

    def run(tag):
        run_dir = tmp_path / tag
        rc = train_cli.main([
            f'data.train_manifest={manifest}',
            f'data.val_manifest={manifest}',
            'data.batch_size=2', 'data.num_length_buckets=1',
            'model.input_size=32',
            'model.layers=[{output_size: 16, kernel_size: 5, stride: 2, '
            'dilation: 1, dropout: 0.2}]',
            'trainer.max_epochs=2', 'trainer.max_steps=3',
            'trainer.log_every_n_steps=1', 'trainer.seed=7',
            'trainer.string_metrics_interval=0',
            'trainer.mesh.data=2',
            f'trainer.default_root_dir={run_dir}',
        ])
        assert rc == 0
        losses = []
        for line in (run_dir / 'metrics.csv').read_text().splitlines()[1:]:
            _, _, metric, value = line.split(',')
            if metric == 'train_loss':
                losses.append(value)
        return losses

    first, second = run('a'), run('b')
    assert len(first) == 3
    assert first == second


def test_jasper_cli_end_to_end(tmp_path):
    """model=jasper through train.py and test.py (eval emits probabilities)."""
    manifest = _make_corpus(tmp_path, n=4, seed=4)
    run_dir = tmp_path / 'jrun'
    import train as train_cli
    rc = train_cli.main([
        f'data.train_manifest={manifest}',
        f'data.val_manifest={manifest}',
        'data.batch_size=2', 'data.num_length_buckets=1',
        'model=jasper', 'model.input_size=32', 'model.mid_layers=2',
        'model.jasper_blocks=[{layer_size: 16, kernel_size: 7, stride: 2, '
        'residual: false, separable: true}, {layer_size: 16, kernel_size: 7, '
        'stride: 1, residual: true, separable: true}]',
        'trainer.max_epochs=1', 'trainer.max_steps=2',
        'trainer.string_metrics_interval=1',
        'trainer.mesh.data=2',
        f'trainer.default_root_dir={run_dir}',
    ])
    assert rc == 0
    assert 'train_wer' in (run_dir / 'metrics.csv').read_text()

    import json as json_mod
    import test as test_cli
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = test_cli.main(['--model-path', str(run_dir),
                            '--test-manifest', manifest])
    assert rc == 0
    result = json_mod.loads(buf.getvalue().strip().splitlines()[-1])
    assert 'wer' in result and result['loss'] is not None

    # Same run through the chunked streaming serving path.
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = test_cli.main(['--model-path', str(run_dir),
                            '--test-manifest', manifest,
                            '--streaming', '--streaming-chunk-frames', '8'])
    assert rc == 0
    result = json_mod.loads(buf.getvalue().strip().splitlines()[-1])
    assert result['streaming'] is True and 'wer' in result


def test_resume_respects_epoch_budget(tmp_path):
    """A resumed run must finish the ORIGINAL max_epochs budget, not train
    max_epochs more: epoch is derived from the restored step."""
    from wav2letter_pytorch_tpu.training.checkpoint import Checkpointer
    import train as train_cli

    manifest = _make_corpus(tmp_path, n=2, seed=4)
    run_dir = tmp_path / 'resume_run'
    base = [
        f'data.train_manifest={manifest}', f'data.val_manifest={manifest}',
        'data.batch_size=2', 'data.num_length_buckets=1',
        'model.input_size=32',
        'model.layers=[{output_size: 24, kernel_size: 7, stride: 2, '
        'dilation: 1, dropout: 0.1}]',
        'trainer.string_metrics_interval=0', 'trainer.mesh.data=2',
        f'trainer.default_root_dir={run_dir}',
    ]
    assert train_cli.main(base + ['trainer.max_epochs=2']) == 0
    ck = Checkpointer(f'{run_dir}/checkpoints')
    step_after = ck.latest_step()
    assert step_after == 2  # 1 batch/epoch x 2 epochs

    # Resume with the SAME budget: nothing left to train.
    assert train_cli.main(base + ['trainer.max_epochs=2', '--resume']) == 0
    assert Checkpointer(f'{run_dir}/checkpoints').latest_step() == 2

    # Raise the budget by one epoch: exactly one more epoch runs.
    assert train_cli.main(base + ['trainer.max_epochs=3', '--resume']) == 0
    assert Checkpointer(f'{run_dir}/checkpoints').latest_step() == 3


def test_resume_epoch_survives_manifest_change(tmp_path):
    """The epoch is persisted IN the checkpoint metadata, so resuming
    against an edited manifest (different len(train_loader)) keeps the
    epoch schedule instead of re-deriving it from step // loader_len."""
    from wav2letter_pytorch_tpu.training.checkpoint import Checkpointer
    import train as train_cli

    manifest2 = _make_corpus(tmp_path, n=2, seed=5)
    run_dir = tmp_path / 'resume_manifest_run'

    def overrides(manifest):
        return [
            f'data.train_manifest={manifest}',
            f'data.val_manifest={manifest}',
            'data.batch_size=2', 'data.num_length_buckets=1',
            'model.input_size=32',
            'model.layers=[{output_size: 24, kernel_size: 7, stride: 2, '
            'dilation: 1, dropout: 0.1}]',
            'trainer.string_metrics_interval=0', 'trainer.mesh.data=2',
            f'trainer.default_root_dir={run_dir}',
        ]

    # 2 epochs x 1 step/epoch on the 2-utterance manifest.
    assert train_cli.main(overrides(manifest2) + ['trainer.max_epochs=2']) == 0
    ck = Checkpointer(f'{run_dir}/checkpoints')
    assert ck.latest_step() == 2
    assert ck.load_extra() == {'epoch': 2}

    # Resume against a GROWN manifest (4 utterances -> 2 steps/epoch).
    # step // len(loader) = 2 // 2 = 1 would wrongly replay epoch 1; the
    # persisted epoch=2 means the budget is already spent.
    bigger = tmp_path / 'bigger'
    bigger.mkdir()
    manifest4 = _make_corpus(bigger, n=4, seed=6)
    assert train_cli.main(overrides(manifest4)
                          + ['trainer.max_epochs=2', '--resume']) == 0
    assert Checkpointer(f'{run_dir}/checkpoints').latest_step() == 2

    # One more epoch of the new 2-step loader: step 2 -> 4.
    assert train_cli.main(overrides(manifest4)
                          + ['trainer.max_epochs=3', '--resume']) == 0
    assert Checkpointer(f'{run_dir}/checkpoints').latest_step() == 4


def test_steps_per_dispatch_equivalence(tmp_path):
    """trainer.steps_per_dispatch=2 (device-side lax.scan over step-stacked
    batches) must produce EXACTLY the same training as single-step dispatch:
    the per-step RNG folds in state.step, so grouping is invisible."""
    import jax
    import train as train_cli
    from wav2letter_pytorch_tpu.training.checkpoint import Checkpointer

    manifest = _make_corpus(tmp_path, n=6, seed=2)
    params = {}
    for n_sd in (1, 2, 3):  # 3 exercises the remainder path (6/2 batches? ->
        # 3 batches/epoch with batch_size=2: n_sd=2 leaves a remainder of 1)
        run_dir = tmp_path / f'run_sd{n_sd}'
        rc = train_cli.main([
            f'data.train_manifest={manifest}', f'data.val_manifest={manifest}',
            'data.batch_size=2', 'data.num_length_buckets=1',
            'model.input_size=32',
            'model.layers=[{output_size: 24, kernel_size: 7, stride: 2, '
            'dilation: 1, dropout: 0.1}]',
            'trainer.max_epochs=2', 'trainer.string_metrics_interval=1',
            'trainer.log_every_n_steps=1',
            'trainer.mesh.data=2', f'trainer.steps_per_dispatch={n_sd}',
            f'trainer.default_root_dir={run_dir}',
        ])
        assert rc == 0
        ck = Checkpointer(f'{run_dir}/checkpoints')
        assert ck.latest_step() == 6  # 3 batches x 2 epochs, regardless of n_sd
        state = ck.restore(None)
        params[n_sd] = state['params']
        ck.close()
    for n_sd in (2, 3):
        for a, b in zip(jax.tree.leaves(params[1]),
                        jax.tree.leaves(params[n_sd])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


def test_steps_per_dispatch_with_buckets(tmp_path):
    """steps_per_dispatch>1 must survive a bucketed loader: batches of
    different static shapes can't share a step-stacked group, so grouping
    is per shape-signature (regression: np.stack shape-mismatch crash)."""
    from wav2letter_pytorch_tpu.training.checkpoint import Checkpointer
    import train as train_cli

    manifest = _make_corpus(tmp_path, n=8, seed=7)
    run_dir = tmp_path / 'bucket_multi'
    assert train_cli.main([
        f'data.train_manifest={manifest}', f'data.val_manifest={manifest}',
        'data.batch_size=2', 'data.num_length_buckets=3',
        'model.input_size=32',
        'model.layers=[{output_size: 24, kernel_size: 7, stride: 2, '
        'dilation: 1, dropout: 0.1}]',
        'trainer.max_epochs=2', 'trainer.steps_per_dispatch=2',
        'trainer.string_metrics_interval=1', 'trainer.mesh.data=2',
        f'trainer.default_root_dir={run_dir}',
    ]) == 0
    # 8 utts over 3 buckets -> 5 batches/epoch (per-bucket remainders
    # pad to full batch_size), 2 epochs -> 10 steps.
    assert Checkpointer(f'{run_dir}/checkpoints').latest_step() == 10


def test_rss_budget_graceful_stop_and_resume(tmp_path):
    """trainer.host_rss_budget_gb: crossing the budget checkpoints at the
    next step boundary exactly like a preemption signal, train.py exits
    with code 75 (EX_TEMPFAIL), and a --resume run completes the original
    epoch budget — the segmented-training loop full_depth_run.py uses
    against buffer-retaining device transports."""
    from wav2letter_pytorch_tpu.training.checkpoint import Checkpointer
    import train as train_cli

    manifest = _make_corpus(tmp_path, n=6, seed=7)
    run_dir = tmp_path / 'rss_run'
    base = [
        f'data.train_manifest={manifest}', f'data.val_manifest={manifest}',
        'data.batch_size=2', 'data.num_length_buckets=1',
        'model.input_size=32',
        'model.layers=[{output_size: 24, kernel_size: 7, stride: 2, '
        'dilation: 1, dropout: 0.1}]',
        'trainer.string_metrics_interval=0', 'trainer.mesh.data=2',
        'trainer.max_epochs=40', 'trainer.checkpoint.every_n_epochs=40',
        f'trainer.default_root_dir={run_dir}',
    ]
    # Any real process RSS exceeds 0.001 GiB, so the guard trips on the
    # very first dispatch and stops at that step boundary.
    rc = train_cli.main(base + ['trainer.host_rss_budget_gb=0.001'])
    assert rc == 75
    ck = Checkpointer(f'{run_dir}/checkpoints')
    step = ck.latest_step()
    assert step is not None and step < 40 * 3
    assert ck.load_extra().get('preempted') is True
    ck.close()

    # Resume WITHOUT the budget: must run to completion with rc 0.
    assert train_cli.main(base + ['--resume']) == 0
    ck = Checkpointer(f'{run_dir}/checkpoints')
    assert ck.latest_step() == 40 * 3
    assert ck.load_extra().get('preempted') is None
    ck.close()


def test_device_cache_trains_to_budget(tmp_path):
    """trainer.device_cache=true: the corpus is uploaded once and epochs
    train from device-resident batches. Exercises bucketed shapes and
    step-stacked multi-dispatch groups against the cache; the run must
    complete the full epoch budget with metrics intact."""
    from wav2letter_pytorch_tpu.training.checkpoint import Checkpointer
    import train as train_cli

    manifest = _make_corpus(tmp_path, n=6, seed=11)
    run_dir = tmp_path / 'dc_run'
    rc = train_cli.main([
        f'data.train_manifest={manifest}', f'data.val_manifest={manifest}',
        'data.batch_size=2', 'data.num_length_buckets=2',
        'model.input_size=32',
        'model.layers=[{output_size: 24, kernel_size: 7, stride: 2, '
        'dilation: 1, dropout: 0.1}]',
        'trainer.device_cache=true', 'trainer.steps_per_dispatch=2',
        'trainer.max_epochs=3', 'trainer.log_every_n_steps=1',
        'trainer.string_metrics_interval=1', 'trainer.mesh.data=2',
        f'trainer.default_root_dir={run_dir}',
    ])
    assert rc == 0
    metrics = (run_dir / 'metrics.csv').read_text()
    assert 'train_wer' in metrics and 'val_wer' in metrics
    ck = Checkpointer(f'{run_dir}/checkpoints')
    assert ck.latest_step() == 3 * 3          # 6 utts / batch 2 = 3 steps
    ck.close()


def test_device_cache_preemption_resume_exact(tmp_path):
    """Exact-replay invariance holds WITH the device cache: a preempted +
    resumed device_cache run logs the bit-identical per-step loss sequence
    as an uninterrupted run (the resume process rebuilds the cache from
    the loader's deterministic epoch-0 order and replays the same seeded
    per-epoch batch permutations, skipping already-applied batches)."""
    import os
    import signal

    from wav2letter_pytorch_tpu.training.logging import MetricLogger
    import train as train_cli

    manifest = _make_corpus(tmp_path, n=6, seed=12)

    def base(run_dir):
        return [
            f'data.train_manifest={manifest}',
            f'data.val_manifest={manifest}',
            'data.batch_size=2', 'data.num_length_buckets=1',
            'model.input_size=32',
            'model.layers=[{output_size: 16, kernel_size: 5, stride: 2, '
            'dilation: 1, dropout: 0.2}]',
            'trainer.device_cache=true', 'trainer.seed=5',
            'trainer.max_epochs=4', 'trainer.log_every_n_steps=1',
            'trainer.string_metrics_interval=0', 'trainer.mesh.data=2',
            f'trainer.default_root_dir={run_dir}',
        ]

    def losses(run_dir):
        out = {}
        for line in (run_dir / 'metrics.csv').read_text().splitlines():
            _, step, metric, value = line.split(',')
            if metric == 'train_loss':
                out[int(step)] = value          # bit-exact string compare
        return out

    ref_dir = tmp_path / 'dc_ref'
    assert train_cli.main(base(ref_dir)) == 0

    # Preempt after the 5th logged train step (mid-epoch 1), then resume.
    pre_dir = tmp_path / 'dc_pre'
    fired = []
    orig_log = MetricLogger.log

    def log_then_preempt(self, step, metrics):
        orig_log(self, step, metrics)
        if 'train_loss' in metrics:
            fired.append(step)
            if len(fired) == 5:
                os.kill(os.getpid(), signal.SIGTERM)

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(MetricLogger, 'log', log_then_preempt)
        assert train_cli.main(base(pre_dir)) == 0
    assert len(fired) >= 5
    assert train_cli.main(base(pre_dir) + ['--resume']) == 0

    ref, pre = losses(ref_dir), losses(pre_dir)
    assert ref == pre
    assert len(ref) == 4 * 3


def test_preemption_checkpoint_and_resume(tmp_path):
    """SIGTERM mid-training saves a resumable checkpoint at the next step
    boundary and fit() returns cleanly; --resume re-enters the interrupted
    epoch, skips the already-applied batches, and completes the original
    budget with every batch applied exactly once."""
    import os
    import signal

    import pytest

    from wav2letter_pytorch_tpu.training.checkpoint import Checkpointer
    from wav2letter_pytorch_tpu.training.logging import MetricLogger
    import train as train_cli

    manifest = _make_corpus(tmp_path, n=6, seed=6)
    run_dir = tmp_path / 'preempt_run'
    base = [
        f'data.train_manifest={manifest}', f'data.val_manifest={manifest}',
        'data.batch_size=2', 'data.num_length_buckets=1',
        'model.input_size=32',
        'model.layers=[{output_size: 24, kernel_size: 7, stride: 2, '
        'dilation: 1, dropout: 0.1}]',
        'trainer.string_metrics_interval=0', 'trainer.mesh.data=2',
        'trainer.max_epochs=40', 'trainer.checkpoint.every_n_epochs=40',
        f'trainer.default_root_dir={run_dir}',
    ]
    # Fire the real SIGTERM right after the first train-step metric is
    # logged (sub_step == 1 always logs): event-driven, so the preemption
    # lands after >=1 applied step and before completion regardless of
    # host load — a wall-clock timer here flaked whenever compile outran
    # or undershot it.
    fired = []
    orig_log = MetricLogger.log

    def log_then_preempt(self, step, metrics):
        orig_log(self, step, metrics)
        if 'train_loss' in metrics and not fired:
            fired.append(step)
            os.kill(os.getpid(), signal.SIGTERM)

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(MetricLogger, 'log', log_then_preempt)
        assert train_cli.main(base) == 0
    assert fired, 'no train-step metric was ever logged'
    ck = Checkpointer(f'{run_dir}/checkpoints')
    step = ck.latest_step()
    assert step is not None and step < 40 * 3   # stopped early, state saved
    extra = ck.load_extra()
    assert extra.get('preempted') is True
    assert 'epoch' in extra and extra['epoch'] < 40
    ck.close()

    # The handler must have been a one-shot graceful stop, not a latch:
    # resuming completes the remaining epochs without re-triggering.
    assert train_cli.main(base + ['--resume']) == 0
    ck = Checkpointer(f'{run_dir}/checkpoints')
    assert ck.latest_step() == 40 * 3          # 3 steps/epoch x 40 epochs
    assert ck.load_extra().get('preempted') is None
    ck.close()
