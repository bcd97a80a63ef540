"""Sequence-parallel (seq-axis) training tests on the 8-device CPU mesh.

The reference handles long sequences only by stride downsampling and
dynamic padding (SURVEY.md §5 "no sequence-parallelism needed"); we go
beyond it TPU-style: ``trainer.mesh.seq`` grows a mesh axis, activation
time dims shard across it via ``with_sharding_constraint``, and the XLA
SPMD partitioner turns every conv into shard-local compute + halo
collective-permutes (reflect SAME padding, strides and dilations
included). Per-chip activation memory scales 1/seq — the training-side
sibling of serving's overlap-chunked long-form inference
(serving/longform.py).

Contracts pinned here: (1) sharding is invisible to the math — a dp x sp
run reproduces pure-dp within reduction-order noise; (2) the time axis is
genuinely partitioned (halo exchanges in the compiled program); (3) it
composes with tensor parallelism and the train CLI.
"""

import numpy as np
import pytest

import jax

from wav2letter_pytorch_tpu import optim
from wav2letter_pytorch_tpu.config import load_config
from wav2letter_pytorch_tpu.parallel import make_mesh, shard_batch
from wav2letter_pytorch_tpu.training import (Trainer, build_decoder,
                                             build_frontend, build_labels,
                                             build_model)


def _cfg(tmp_path, data, seq, model=1, extra=()):
    return load_config([
        'data.train_manifest=x', 'data.val_manifest=y',
        'model.input_size=32', 'model.mid_layers=2',
        'model.layers=[{output_size: 32, kernel_size: 13, stride: 2, '
        'dilation: 1, dropout: 0.0}, {output_size: 32, kernel_size: 7, '
        'stride: 1, dilation: 2, dropout: 0.0}]',
        'trainer.string_metrics_interval=0',
        f'trainer.mesh.data={data}', f'trainer.mesh.seq={seq}',
        f'trainer.mesh.model={model}',
        f'trainer.default_root_dir={tmp_path}/run{data}x{model}x{seq}',
        *extra,
    ])


def _batch(B, t=12800):
    rng = np.random.default_rng(0)
    targets = rng.integers(1, 29, size=(B, 8)).astype(np.int32)
    lengths = np.full((B,), t, np.int32)
    lengths[1::2] = t - 1600          # mixed valid lengths exercise masks
    return dict(
        audio=(rng.standard_normal((B, t)) * 0.1).astype(np.float32),
        audio_lengths=lengths,
        targets=targets,
        target_lengths=np.full((B,), 8, np.int32),
        batch_mask=np.ones((B,), np.float32),
    )


def _make_trainer(tmp_path, data, seq, model=1, extra=()):
    cfg = _cfg(tmp_path, data, seq, model, extra)
    labels = build_labels(cfg.model)
    mdl = build_model(cfg.model, len(labels))
    return Trainer(cfg, mdl, build_frontend(cfg.model, dither=0.0),
                   optim.sgd(optim.constant_lr(1e-3), momentum=0.9),
                   optim.constant_lr(1e-3),
                   build_decoder(cfg.model, labels),
                   run_dir=f'{tmp_path}/run{data}x{model}x{seq}')


def test_make_mesh_seq_axes():
    m = make_mesh(2, seq=4)
    assert m.axis_names == ('data', 'seq') and m.devices.shape == (2, 4)
    m = make_mesh(2, model=2, seq=2)
    assert m.axis_names == ('data', 'model', 'seq')
    assert m.devices.shape == (2, 2, 2)
    with pytest.raises(ValueError, match='visible'):
        make_mesh(4, seq=4)


def _run_steps(trainer, batch, n=3):
    trainer.init_state(batch)
    step = trainer._get_jitted('train')
    db = shard_batch(batch, trainer.mesh)
    loss = None
    for _ in range(n):
        trainer.state, loss, _, _ = step(trainer.state, db)
    return float(loss), jax.device_get(trainer.state.params)


def test_sp_parity_vs_dp(tmp_path):
    """(data=2, seq=4) must reproduce pure (data=2) on the same global
    batch — time partitioning invisible to the math (halo-exchanged
    reflect-pad convs, cross-shard BN stats, masked frontend norm)."""
    batch = _batch(4)
    loss_dp, params_dp = _run_steps(_make_trainer(tmp_path, 2, 1), batch)
    loss_sp, params_sp = _run_steps(_make_trainer(tmp_path, 2, 4), batch)
    assert loss_sp == pytest.approx(loss_dp, rel=2e-4)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - b))), params_dp, params_sp)
    assert max(jax.tree_util.tree_leaves(diffs)) < 2e-4


def test_sp_time_axis_actually_partitioned(tmp_path):
    """The compiled train step must contain halo exchanges
    (collective-permute) — proof the convs run shard-local over time
    rather than gathering the full sequence."""
    trainer = _make_trainer(tmp_path, 2, 4)
    batch = _batch(4)
    trainer.init_state(batch)
    db = shard_batch(batch, trainer.mesh)
    step = trainer._get_jitted('train')
    hlo = step.lower(trainer.state, db).compile().as_text()
    assert hlo.count('collective-permute') > 0


def test_sp_eval_parity(tmp_path):
    batch = _batch(4)
    t_dp = _make_trainer(tmp_path, 2, 1)
    t_sp = _make_trainer(tmp_path, 2, 4)
    t_dp.init_state(batch)
    t_sp.init_state(batch)
    l_dp, out_dp, _ = t_dp._get_jitted('eval')(
        t_dp.state, shard_batch(batch, t_dp.mesh))
    l_sp, out_sp, _ = t_sp._get_jitted('eval')(
        t_sp.state, shard_batch(batch, t_sp.mesh))
    assert float(l_sp) == pytest.approx(float(l_dp), rel=2e-4)
    # greedy argmax ids must be identical (decodes can't drift)
    assert (np.asarray(out_dp) == np.asarray(out_sp)).all()


def test_sp_composes_with_tp(tmp_path):
    """Full 3-D mesh (data=2, model=2, seq=2): channel-sharded weights +
    time-sharded activations, same math."""
    batch = _batch(4)
    loss_dp, params_dp = _run_steps(_make_trainer(tmp_path, 2, 1), batch)
    loss_3d, params_3d = _run_steps(_make_trainer(tmp_path, 2, 2, model=2),
                                    batch)
    assert loss_3d == pytest.approx(loss_dp, rel=2e-4)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - b))), params_dp, params_3d)
    assert max(jax.tree_util.tree_leaves(diffs)) < 2e-4


def test_sp_train_cli(tmp_path):
    """train.py end-to-end with trainer.mesh.seq=2 (loader batches,
    checkpointing, validation all through the seq-sharded step)."""
    import sys
    sys.path.insert(0, str(tmp_path))
    from test_train_e2e import _make_corpus
    import train as train_cli
    from wav2letter_pytorch_tpu.training.checkpoint import Checkpointer

    manifest = _make_corpus(tmp_path, n=4, seed=3)
    run_dir = tmp_path / 'sp_cli_run'
    assert train_cli.main([
        f'data.train_manifest={manifest}', f'data.val_manifest={manifest}',
        'data.batch_size=2', 'data.num_length_buckets=1',
        'model.input_size=32',
        'model.layers=[{output_size: 24, kernel_size: 7, stride: 2, '
        'dilation: 1, dropout: 0.1}]',
        'trainer.string_metrics_interval=0',
        'trainer.mesh.data=2', 'trainer.mesh.seq=2',
        'trainer.max_epochs=2',
        f'trainer.default_root_dir={run_dir}',
    ]) == 0
    ck = Checkpointer(f'{run_dir}/checkpoints')
    assert ck.latest_step() == 4
    ck.close()
