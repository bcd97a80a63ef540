"""Config -> object builders: optimizer/scheduler variants, metrics print."""

import numpy as np
import pytest

from wav2letter_pytorch_tpu.config import load_config
from wav2letter_pytorch_tpu.training import (build_frontend, build_labels,
                                             build_model, build_optimizer,
                                             model_input_size)


def _model_cfg(*overrides):
    cfg = load_config(['data.train_manifest=x', 'data.val_manifest=y',
                       *overrides])
    return cfg.model


def test_default_optimizer_is_sgd_exponential():
    mcfg = _model_cfg()
    tx, sched = build_optimizer(mcfg, steps_per_epoch=10, total_steps=50)
    assert sched(0) == pytest.approx(1e-5)
    assert sched(10) == pytest.approx(1e-5 * 0.999)
    # smoke: one update
    import jax.numpy as jnp
    params = {'w': jnp.ones(3)}
    state = tx.init(params)
    updates, _ = tx.update({'w': jnp.ones(3)}, state, params)
    assert np.isfinite(np.asarray(updates['w'])).all()


def test_novograd_group():
    mcfg = _model_cfg('optimizer=novograd')
    assert mcfg.optimizer['_target_'] == 'novograd.Novograd'
    tx, sched = build_optimizer(mcfg, 10, 50)
    import jax.numpy as jnp
    params = {'w': jnp.ones(3)}
    state = tx.init(params)
    updates, _ = tx.update({'w': jnp.ones(3)}, state, params)
    assert np.isfinite(np.asarray(updates['w'])).all()


def test_one_cycle_group():
    mcfg = _model_cfg('optimizer=one_cycle')
    tx, sched = build_optimizer(mcfg, 10, total_steps=100)
    lrs = [float(sched(s)) for s in (0, 30, 99)]
    assert lrs[1] > lrs[0] > lrs[2]


def test_unknown_targets_rejected():
    mcfg = _model_cfg()
    bad = dict(mcfg)
    bad['optimizer'] = {'_target_': 'torch.optim.NotAThing', 'lr': 1e-3}
    with pytest.raises(ValueError, match='optimizer'):
        build_optimizer(bad, 1, 1)


def test_input_size_default_from_audio_conf():
    mcfg = dict(_model_cfg())
    mcfg['input_size'] = None
    assert model_input_size(mcfg) == 161  # 1 + 320/2 @16k/20ms


def test_frontend_from_config_8k():
    mcfg = _model_cfg('audio=standard_8k')
    fe = build_frontend(mcfg)
    assert fe.conf.sample_rate == 8000
    assert fe.n_fft == 256


def test_string_metrics_printing(capsys):
    from wav2letter_pytorch_tpu.decoding import GreedyDecoder
    from wav2letter_pytorch_tpu.training.metrics import string_metrics
    decoder = GreedyDecoder(['_', 'a', 'b', ' '])
    probs = np.zeros((1, 3, 4))
    probs[0, :, 1] = 1.0
    m = string_metrics(decoder, probs, np.array([3]), ['a'], 'train',
                       print_decoded_prob=1.0)
    out = capsys.readouterr().out
    assert 'reference: a' in out
    assert 'decoded  : a' in out
    assert m['train_cer'] == 0
    assert m['train_wer'] == 0
    assert m['train_len_ratio'] == 1.0


def test_init_mode_plumbed():
    mcfg = dict(_model_cfg())
    mcfg['init_mode'] = 'kaiming_normal'
    model = build_model(mcfg, 29)
    assert model.init_mode == 'kaiming_normal'
    import jax
    import jax.numpy as jnp
    v = model.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 64)),
                   jnp.array([32]), train=False)
    import numpy as np
    assert np.isfinite(np.asarray(
        jax.tree.leaves(v['params'])[0])).all()
