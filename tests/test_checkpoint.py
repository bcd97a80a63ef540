"""Checkpointer: retention, best-k by metric, save/restore round trips."""

import jax.numpy as jnp
import numpy as np
import pytest

from wav2letter_pytorch_tpu.training.checkpoint import (Checkpointer,
                                                        load_params,
                                                        save_params)


def _state(x):
    return {'params': {'w': jnp.full((4,), float(x))},
            'step': jnp.asarray(x, jnp.int32)}


def test_keep_last_retention(tmp_path):
    ck = Checkpointer(str(tmp_path / 'ck'), keep_last=2)
    for step in (1, 2, 3):
        ck.save(step, _state(step))
    assert ck.latest_step() == 3
    restored = ck.restore(_state(0))
    assert int(restored['step']) == 3
    np.testing.assert_allclose(np.asarray(restored['params']['w']), 3.0)
    # oldest checkpoint was dropped by keep_last=2 retention
    with pytest.raises(FileNotFoundError):
        ck.restore(_state(0), step=1)
    ck.close()


def test_meta_sidecars_pruned_with_retention(tmp_path):
    """meta_<step>.json sidecars follow their checkpoints out: retention
    deletes the dirs via orbax, and save() prunes the orphaned metadata so
    load_extra() can never serve a step that no longer exists."""
    import os
    d = tmp_path / 'ck'
    ck = Checkpointer(str(d), keep_last=2)
    for step in (1, 2, 3):
        ck.save(step, _state(step), extra={'epoch': step * 5})
    metas = sorted(f for f in os.listdir(d) if f.startswith('meta_'))
    assert metas == ['meta_2.json', 'meta_3.json']
    assert ck.load_extra() == {'epoch': 15}
    assert ck.load_extra(step=1) == {}   # pruned, not stale
    ck.close()


def test_best_k_by_metric(tmp_path):
    ck = Checkpointer(str(tmp_path / 'ck'), keep_last=1, monitor='val_loss')
    ck.save(1, _state(1), metrics={'val_loss': 5.0})
    ck.save(2, _state(2), metrics={'val_loss': 1.0})   # best
    ck.save(3, _state(3), metrics={'val_loss': 9.0})
    # keep_last=1 with best_fn keeps the best step (2), not the latest
    restored = ck.restore(_state(0), step=2)
    assert int(restored['step']) == 2
    ck.close()


def test_one_shot_params_roundtrip(tmp_path):
    tree = {'a': jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
    save_params(str(tmp_path / 'p'), tree)
    loaded = load_params(str(tmp_path / 'p'), template=tree)
    np.testing.assert_array_equal(np.asarray(loaded['a']),
                                  np.asarray(tree['a']))


def test_metricless_saves_never_beat_real_metrics(tmp_path):
    """Checkpoint cadence ≠ val cadence: saves without the monitored metric
    must not rank as 'best' (a 0.0 default under mode='min' used to beat
    every real val_loss and evict the genuinely-best checkpoints)."""
    ck = Checkpointer(str(tmp_path / 'ck'), keep_last=1, monitor='val_loss')
    ck.save(1, _state(1), metrics={'val_loss': 1.0})   # the true best
    ck.save(2, _state(2), metrics=None)                # no val this epoch
    ck.save(3, _state(3), metrics={'val_loss': 9.0})
    # step 1 (best val_loss) must survive best-k retention
    restored = ck.restore(_state(0), step=1)
    assert int(restored['step']) == 1
    ck.close()


def test_metric_dict_without_monitor_key(tmp_path):
    ck = Checkpointer(str(tmp_path / 'ck'), keep_last=1, monitor='val_loss')
    ck.save(1, _state(1), metrics={'val_loss': 2.0})
    ck.save(2, _state(2), metrics={'other': 0.0})      # monitor key absent
    restored = ck.restore(_state(0), step=1)
    assert int(restored['step']) == 1
    ck.close()


def test_average_checkpoints(tmp_path):
    """Uniform weight averaging over the newest K checkpoints: float
    leaves of params/batch_stats are averaged, everything else (step,
    opt_state, rng, non-float leaves) comes from the newest."""
    import jax

    from wav2letter_pytorch_tpu.training.checkpoint import average_checkpoints
    from wav2letter_pytorch_tpu.training.trainer import TrainState

    def state(x):
        return TrainState(
            step=jnp.asarray(x, jnp.int32),
            params={'w': jnp.full((3,), float(x)),
                    'n': jnp.asarray(x, jnp.int32)},
            batch_stats={'mean': jnp.full((2,), 10.0 * x)},
            opt_state={'mu': jnp.full((3,), float(x))},
            rng=jax.random.PRNGKey(x))

    ck = Checkpointer(str(tmp_path / 'ck'), keep_last=5)
    for s in (1, 2, 3):
        ck.save(s, state(s))
    avg = average_checkpoints(ck, jax.device_get(state(0)), last_k=2)
    np.testing.assert_allclose(np.asarray(avg.params['w']), 2.5)
    np.testing.assert_allclose(np.asarray(avg.batch_stats['mean']), 25.0)
    assert int(avg.params['n']) == 3          # non-float: newest wins
    assert int(avg.step) == 3                 # bookkeeping from newest
    np.testing.assert_allclose(np.asarray(avg.opt_state['mu']), 3.0)
    # last_k larger than what exists: averages all of them
    avg_all = average_checkpoints(ck, jax.device_get(state(0)), last_k=99)
    np.testing.assert_allclose(np.asarray(avg_all.params['w']), 2.0)
    ck.close()
