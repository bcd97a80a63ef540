"""Tensor-parallel (model-axis) training tests on the 8-device CPU mesh.

The reference has no model parallelism (SURVEY.md §2.3); ``parallel/tp.py``
adds it TPU-style: a 2-D (data, model) mesh and channel-sharding
annotations on the state, with the XLA SPMD partitioner inserting the
collectives. These tests pin the two contracts that make that safe to
ship: (1) sharding is *invisible to the math* — a dp x tp run reproduces
the pure-dp run bit-for-bit-ish; (2) the layout really is distributed —
weights are not silently replicated.
"""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from wav2letter_pytorch_tpu import optim
from wav2letter_pytorch_tpu.config import load_config
from wav2letter_pytorch_tpu.parallel import (make_mesh, model_axis_spec,
                                             shard_batch)
from wav2letter_pytorch_tpu.training import (Trainer, build_decoder,
                                             build_frontend, build_labels,
                                             build_model)


def _cfg(tmp_path, data, model, extra=()):
    return load_config([
        'data.train_manifest=x', 'data.val_manifest=y',
        'model.input_size=32', 'model.mid_layers=2',
        'model.layers=[{output_size: 32, kernel_size: 7, stride: 2, '
        'dilation: 1, dropout: 0.0}, {output_size: 32, kernel_size: 7, '
        'stride: 1, dilation: 1, dropout: 0.0}]',
        'trainer.string_metrics_interval=0',
        f'trainer.mesh.data={data}', f'trainer.mesh.model={model}',
        f'trainer.default_root_dir={tmp_path}/run{data}x{model}',
        *extra,
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


def _make_trainer(tmp_path, data, model, extra=()):
    cfg = _cfg(tmp_path, data, model, extra)
    labels = build_labels(cfg.model)
    mdl = build_model(cfg.model, len(labels))
    return Trainer(cfg, mdl, build_frontend(cfg.model, dither=0.0),
                   optim.sgd(optim.constant_lr(1e-3), momentum=0.9),
                   optim.constant_lr(1e-3),
                   build_decoder(cfg.model, labels),
                   run_dir=f'{tmp_path}/run{data}x{model}')


def test_make_mesh_2d():
    mesh = make_mesh(4, model=2)
    assert mesh.axis_names == ('data', 'model')
    assert mesh.devices.shape == (4, 2)
    mesh = make_mesh(-1, model=2)          # all 8 devices -> 4x2
    assert mesh.devices.shape == (4, 2)
    with pytest.raises(ValueError, match='visible'):
        make_mesh(8, model=2)              # 16 devices needed


def test_model_axis_spec_rules():
    m = 2
    # conv kernel (K, Cin, Cout): shard Cout
    assert model_axis_spec(np.zeros((7, 32, 32), np.float32), m) == \
        P(None, None, 'model')
    # bias / BN stat (C,): shard C
    assert model_axis_spec(np.zeros((32,), np.float32), m) == P('model')
    # 29-label head: not divisible -> replicated
    assert model_axis_spec(np.zeros((1, 32, 29), np.float32), m) == P()
    # RNG key (uint32) and scalar step: replicated
    assert model_axis_spec(np.zeros((2,), np.uint32), m) == P()
    assert model_axis_spec(np.zeros((), np.float32), m) == P()
    # too narrow to shard usefully
    assert model_axis_spec(np.zeros((8,), np.float32), m) == P()


def test_tp_parity_vs_dp(tmp_path):
    """dp=4 x tp=2 must reproduce the pure-dp run: same losses, params."""
    batch = _batch(8)
    results = {}
    for data, model in ((4, 1), (2, 2)):
        tr = _make_trainer(tmp_path, data, model)
        tr.init_state(batch)
        step = tr._get_jitted('train')
        db = shard_batch(batch, tr.mesh)
        losses = []
        for _ in range(3):
            tr.state, loss, _, _ = step(tr.state, db)
            losses.append(float(loss))
        results[(data, model)] = (losses, jax.device_get(tr.state.params))
    l_dp, p_dp = results[(4, 1)]
    l_tp, p_tp = results[(2, 2)]
    np.testing.assert_allclose(l_dp, l_tp, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_dp), jax.tree.leaves(p_tp)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)


def test_tp_weights_actually_sharded(tmp_path):
    tr = _make_trainer(tmp_path, 2, 2)
    tr.init_state(_batch(8))
    kernel = tr.state.params['conv1d_0']['Conv_0']['kernel']
    spec = kernel.sharding.spec
    assert 'model' in [ax for ax in spec if ax is not None], spec
    # each model shard holds half the output channels
    shapes = {s.data.shape for s in kernel.addressable_shards}
    assert shapes == {(7, 32, 16)}
    # optimizer momentum mirrors the param layout
    momenta = [leaf for leaf in jax.tree.leaves(
        tr.state.opt_state, is_leaf=lambda x: hasattr(x, 'sharding'))
        if getattr(leaf, 'shape', None) == kernel.shape]
    assert momenta and all(
        {s.data.shape for s in l.addressable_shards} == {(7, 32, 16)}
        for l in momenta)
    # the 29-label head stays replicated
    head = tr.state.params[f'conv1d_{2}']['Conv_0']['kernel']
    assert head.sharding.spec == P() or all(
        ax is None for ax in head.sharding.spec)


def test_tp_sharded_after_step(tmp_path):
    """out_shardings must preserve the model-sharded layout step to step."""
    tr = _make_trainer(tmp_path, 2, 2)
    batch = _batch(8)
    tr.init_state(batch)
    step = tr._get_jitted('train')
    db = shard_batch(batch, tr.mesh)
    tr.state, loss, _, _ = step(tr.state, db)
    kernel = tr.state.params['conv1d_0']['Conv_0']['kernel']
    assert {s.data.shape for s in kernel.addressable_shards} == {(7, 32, 16)}
    assert np.isfinite(float(loss))


def test_tp_multi_step_dispatch(tmp_path):
    """steps_per_dispatch (scan over step-stacked batches) under TP matches
    the same number of single-step dispatches."""
    batch = _batch(8)
    ref = _make_trainer(tmp_path, 2, 2)
    ref.init_state(batch)
    step = ref._get_jitted('train')
    db = shard_batch(batch, ref.mesh)
    for _ in range(2):
        ref.state, ref_loss, _, _ = step(ref.state, db)

    multi = _make_trainer(tmp_path, 2, 2,
                          extra=('trainer.steps_per_dispatch=2',))
    multi.init_state(batch)
    mstep = multi._get_jitted('train_multi')
    stacked = {k: np.stack([v, v]) for k, v in batch.items()
               if isinstance(v, np.ndarray)}
    mdb = shard_batch(stacked, multi.mesh, batch_dim=1)
    multi.state, losses, _, _ = mstep(multi.state, mdb)
    assert float(losses[-1]) == pytest.approx(float(ref_loss), rel=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(ref.state.params)),
                    jax.tree.leaves(jax.device_get(multi.state.params))):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)


def test_tp_checkpoint_cross_topology(tmp_path):
    """A checkpoint written by a TP run restores into a pure-DP trainer
    (and vice versa is symmetric): orbax gathers shards on save and the
    restore template's shardings re-place them."""
    batch = _batch(8)
    tp = _make_trainer(tmp_path, 2, 2)
    tp.init_state(batch)
    step = tp._get_jitted('train')
    tp.state, _, _, _ = step(tp.state, shard_batch(batch, tp.mesh))

    from wav2letter_pytorch_tpu.training.checkpoint import Checkpointer
    ck = Checkpointer(f'{tmp_path}/ck', keep_last=2)
    ck.save(1, tp.state)

    dp = _make_trainer(tmp_path, 4, 1)
    dp.init_state(batch)
    restored = ck.restore(dp.state)
    ck.close()
    for a, b in zip(jax.tree.leaves(jax.device_get(tp.state.params)),
                    jax.tree.leaves(jax.device_get(restored.params))):
        np.testing.assert_allclose(a, b, rtol=0, atol=0)
    # restored leaves carry the DP trainer's (replicated) layout
    kernel = restored.params['conv1d_0']['Conv_0']['kernel']
    assert {s.data.shape for s in kernel.addressable_shards} == {(7, 32, 32)}


def test_tp_jasper_block_variants(tmp_path):
    """Jasper's separable/grouped/residual blocks train under a 2x2 mesh
    (depthwise kernels (K, 1, C) shard C; grouped kernels shard Cout)."""
    cfg = load_config([
        'data.train_manifest=x', 'data.val_manifest=y',
        'model=jasper', 'model.input_size=32', 'model.mid_layers=3',
        'model.jasper_blocks=['
        '{layer_size: 32, kernel_size: 7, stride: 2, residual: false, '
        'separable: true}, '
        '{layer_size: 32, kernel_size: 7, stride: 1, residual: true, '
        'separable: true, groups: 2}, '
        '{layer_size: 64, kernel_size: 1, stride: 1, residual: false, '
        'separable: false}]',
        'trainer.string_metrics_interval=0',
        'trainer.mesh.data=2', 'trainer.mesh.model=2',
        f'trainer.default_root_dir={tmp_path}/jasper_tp',
    ])
    labels = build_labels(cfg.model)
    mdl = build_model(cfg.model, len(labels))
    tr = Trainer(cfg, mdl, build_frontend(cfg.model, dither=0.0),
                 optim.sgd(optim.constant_lr(1e-3), momentum=0.9),
                 optim.constant_lr(1e-3), build_decoder(cfg.model, labels),
                 run_dir=f'{tmp_path}/jasper_tp')
    batch = _batch(8)
    tr.init_state(batch)
    step = tr._get_jitted('train')
    tr.state, loss, _, _ = step(tr.state, shard_batch(batch, tr.mesh))
    assert np.isfinite(float(loss))
    sharded = [l for l in jax.tree.leaves(tr.state.params)
               if any(ax == 'model' for ax in l.sharding.spec)]
    assert sharded, 'no Jasper weights were model-sharded'
