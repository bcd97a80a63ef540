"""Augmentation tests: mask shapes, determinism, config wiring."""

import numpy as np

import jax
import jax.numpy as jnp

from wav2letter_pytorch_tpu.data.augmentations import (build_augment_fn,
                                                       spec_augment,
                                                       spec_cutout)


def _feats(B=3, T=100, F=64):
    return jnp.ones((B, T, F))


def test_spec_augment_zeroes_bands():
    rng = jax.random.PRNGKey(0)
    out = np.asarray(spec_augment(rng, _feats(), freq_masks=2, time_masks=2))
    assert out.shape == (3, 100, 64)
    assert set(np.unique(out)).issubset({0.0, 1.0})
    # some masking happened, but most content survives
    frac_zero = 1 - out.mean()
    assert 0.0 < frac_zero < 0.9

    # zeroed frequency bands are full columns; time bands full rows
    for b in range(3):
        zero_freqs = np.where((out[b] == 0).all(axis=0))[0]
        zero_times = np.where((out[b] == 0).all(axis=1))[0]
        assert len(zero_freqs) <= 2 * 15
        assert len(zero_times) <= 2 * 50


def test_spec_cutout_rectangles():
    rng = jax.random.PRNGKey(1)
    out = np.asarray(spec_cutout(rng, _feats(), rect_masks=3))
    assert out.shape == (3, 100, 64)
    assert (out == 0).any()
    assert out.mean() > 0.3


def test_deterministic_given_key():
    rng = jax.random.PRNGKey(2)
    a = np.asarray(spec_augment(rng, _feats()))
    b = np.asarray(spec_augment(rng, _feats()))
    c = np.asarray(spec_augment(jax.random.PRNGKey(3), _feats()))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_jittable():
    fn = jax.jit(lambda r, x: spec_augment(r, x, freq_masks=1, time_masks=1))
    out = fn(jax.random.PRNGKey(4), _feats())
    assert np.isfinite(np.asarray(out)).all()


def test_build_augment_fn_composition():
    fn = build_augment_fn({'spec_augment': {'freq_masks': 1},
                           'spec_cutout': {'rect_masks': 2}})
    out = np.asarray(fn(jax.random.PRNGKey(5), _feats()))
    assert (out == 0).any()
    assert build_augment_fn(None) is None
    assert build_augment_fn({}) is None


def test_unknown_augmentation_rejected():
    import pytest
    with pytest.raises(ValueError, match='Unknown augmentation'):
        build_augment_fn({'nope': {}})


def test_false_disables_augmentation():
    """`spec_augment: false` in config must disable it, not enable-with-
    defaults (kwargs=False used to be coerced to {})."""
    assert build_augment_fn({'spec_augment': False}) is None
    # ...while True / None / {} mean enabled-with-defaults
    fn = build_augment_fn({'spec_augment': True})
    out = fn(jax.random.PRNGKey(0), _feats())
    assert out.shape == _feats().shape
    # a disabled step alongside an enabled one is skipped
    fn = build_augment_fn({'spec_cutout': False, 'spec_augment': {}})
    assert fn is not None
