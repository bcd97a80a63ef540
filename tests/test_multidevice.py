"""Data-parallel SPMD tests on the 8-virtual-device CPU mesh.

Exercises the full sharded training step (BASELINE.json config #5:
multi-chip data-parallel CTC training) and checks 1-device vs 8-device
numerical equivalence — the global-batch SPMD formulation must make device
count invisible to the math (incl. cross-replica BatchNorm).
"""

import os

import numpy as np
import pytest

import jax

from wav2letter_pytorch_tpu import optim
from wav2letter_pytorch_tpu.config import load_config
from wav2letter_pytorch_tpu.parallel import make_mesh, shard_batch
from wav2letter_pytorch_tpu.training import (Trainer, build_decoder,
                                             build_frontend, build_labels,
                                             build_model)


def _cfg(tmp_path, n_dev):
    return load_config([
        'data.train_manifest=x', 'data.val_manifest=y',
        'model.input_size=32',
        'model.layers=[{output_size: 32, kernel_size: 7, stride: 2, '
        'dilation: 1, dropout: -1.0}]',
        'trainer.string_metrics_interval=0',
        f'trainer.mesh.data={n_dev}',
        f'trainer.default_root_dir={tmp_path}/run{n_dev}',
    ])


def _batch(B, t=4800):
    rng = np.random.default_rng(0)
    targets = rng.integers(1, 29, size=(B, 8)).astype(np.int32)
    return dict(
        audio=(rng.standard_normal((B, t)) * 0.1).astype(np.float32),
        audio_lengths=np.full((B,), t, np.int32),
        targets=targets,
        target_lengths=np.full((B,), 8, np.int32),
        batch_mask=np.ones((B,), np.float32),
    )


def _make_trainer(tmp_path, n_dev):
    cfg = _cfg(tmp_path, n_dev)
    labels = build_labels(cfg.model)
    model = build_model(cfg.model, len(labels))
    return Trainer(cfg, model, build_frontend(cfg.model, dither=0.0),
                   optim.sgd(optim.constant_lr(1e-3), momentum=0.9),
                   optim.constant_lr(1e-3),
                   build_decoder(cfg.model, labels),
                   run_dir=f'{tmp_path}/run{n_dev}')


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_batch_is_sharded_across_devices(tmp_path):
    mesh = make_mesh(8)
    batch = _batch(8)
    db = shard_batch(batch, mesh)
    assert len(db['audio'].sharding.device_set) == 8
    # each device holds 1/8 of the batch rows
    shard_shapes = {s.data.shape for s in db['audio'].addressable_shards}
    assert shard_shapes == {(1, 4800)}


def test_indivisible_batch_rejected(tmp_path):
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match='divisible'):
        shard_batch(_batch(6), mesh)


def test_device_count_invariance(tmp_path):
    """Same global batch: 1-device and 8-device training must agree."""
    batch = _batch(8)
    losses = {}
    params = {}
    for n_dev in (1, 8):
        trainer = _make_trainer(tmp_path, n_dev)
        trainer.init_state(batch)
        step = trainer._get_jitted('train')
        db = shard_batch(batch, trainer.mesh)
        for _ in range(3):
            trainer.state, loss, _, _ = step(trainer.state, db)
        losses[n_dev] = float(loss)
        params[n_dev] = jax.device_get(trainer.state.params)
    assert losses[1] == pytest.approx(losses[8], rel=2e-4)
    flat1 = jax.tree.leaves(params[1])
    flat8 = jax.tree.leaves(params[8])
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


def test_validation_on_mesh(tmp_path):
    trainer = _make_trainer(tmp_path, 8)
    batch = _batch(8)
    trainer.init_state(batch)

    class OneBatchLoader:
        def __iter__(self):
            b = dict(batch)
            b['texts'] = ['hello'] * 8
            yield b

    metrics = trainer.validate(OneBatchLoader())
    assert np.isfinite(metrics['val_loss'])
    assert 'val_wer' in metrics


def test_dryrun_multichip_driver_call(tmp_path):
    """Replicate the driver EXACTLY: fresh process, ambient env (axon
    platform pinned), direct import + call — no __main__ guard, no
    XLA_FLAGS preparation. Regression for round-1's red MULTICHIP check.
    """
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parent.parent
    env = dict(os.environ)
    # Undo conftest's CPU forcing so the subprocess sees the pristine env.
    env.pop('JAX_PLATFORMS', None)
    env['XLA_FLAGS'] = env.get('XLA_FLAGS', '').replace(
        '--xla_force_host_platform_device_count=8', '').strip()
    proc = subprocess.run(
        [sys.executable, '-c',
         'import __graft_entry__; __graft_entry__.dryrun_multichip(8)'],
        cwd=repo, env=env, capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert 'dryrun_multichip(8)' in proc.stdout
