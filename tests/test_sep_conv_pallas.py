"""Fused separable-conv unit kernel vs the two-conv lax reference.

Geometries cover the Jasper/QuartzNet separable blocks that the fused
path serves (stride 1; odd/even K; dilation 2; Cin != Cout), with
per-sample length masking on and off, forward and all three gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wav2letter_pytorch_tpu.models.jasper import get_same_padding
from wav2letter_pytorch_tpu.ops.sep_conv_pallas import (sep_conv1d,
                                                        sep_conv1d_xla)

GEOMETRIES = [
    # (B, T, Cin, Cout, K, dilation)
    (2, 50, 128, 128, 33, 1),
    (2, 50, 128, 256, 32, 1),    # even K: t_out = T + 1; Cin != Cout
    (1, 60, 256, 128, 87, 2),    # QuartzNet C2 dilation
    (2, 40, 64, 128, 11, 1),     # first-block width
]


def _setup(B, T, Cin, Cout, K, rng):
    x = jnp.asarray(rng.standard_normal((B, T, Cin)).astype(np.float32))
    wdw = jnp.asarray((rng.standard_normal((K, Cin)) * 0.1).astype(np.float32))
    wpw = jnp.asarray(
        (rng.standard_normal((Cin, Cout)) * 0.05).astype(np.float32))
    lens = jnp.asarray(rng.integers(T // 2, T + 1, size=(B,)), jnp.float32)
    return x, wdw, wpw, lens


@pytest.mark.parametrize('B,T,Cin,Cout,K,d', GEOMETRIES)
@pytest.mark.parametrize('use_mask', [True, False])
def test_forward_parity(B, T, Cin, Cout, K, d, use_mask):
    rng = np.random.default_rng(0)
    x, wdw, wpw, lens = _setup(B, T, Cin, Cout, K, rng)
    p = get_same_padding(K, 1, d)
    want = sep_conv1d_xla(x, lens, wdw, wpw, d, p, use_mask)
    got = sep_conv1d(x, lens, wdw, wpw, d, p, use_mask, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('B,T,Cin,Cout,K,d', GEOMETRIES)
def test_gradient_parity(B, T, Cin, Cout, K, d):
    rng = np.random.default_rng(1)
    x, wdw, wpw, lens = _setup(B, T, Cin, Cout, K, rng)
    p = get_same_padding(K, 1, d)

    def f(x, wdw, wpw):
        return jnp.sum(jnp.sin(sep_conv1d(x, lens, wdw, wpw, d, p, True,
                                          interpret=True)))

    def f_ref(x, wdw, wpw):
        return jnp.sum(jnp.sin(sep_conv1d_xla(x, lens, wdw, wpw, d, p,
                                              True)))

    got = jax.grad(f, argnums=(0, 1, 2))(x, wdw, wpw)
    want = jax.grad(f_ref, argnums=(0, 1, 2))(x, wdw, wpw)
    for name, gv, wv in zip(('dx', 'dwdw', 'dwpw'), got, want):
        np.testing.assert_allclose(
            np.asarray(gv), np.asarray(wv), rtol=1e-3, atol=2e-4,
            err_msg=f'{name} mismatch (K={K} Cin={Cin} Cout={Cout} d={d})')


def test_jit_value_and_grad():
    rng = np.random.default_rng(2)
    x, wdw, wpw, lens = _setup(2, 30, 128, 128, 11, rng)

    @jax.jit
    def step(x, wdw, wpw):
        return jax.value_and_grad(
            lambda w: jnp.sum(sep_conv1d(x, lens, w, wpw, 1, 5, True,
                                         interpret=True) ** 2))(wdw)

    loss, g = step(x, wdw, wpw)
    loss_ref = float(jnp.sum(
        sep_conv1d_xla(x, lens, wdw, wpw, 1, 5, True) ** 2))
    assert float(loss) == pytest.approx(loss_ref, rel=1e-4)
    assert g.shape == wdw.shape


def test_model_parity_fused_vs_unfused(monkeypatch):
    """The Jasper stack produces identical outputs and identical param
    trees whichever separable backend is selected."""
    from wav2letter_pytorch_tpu.models import Jasper
    import wav2letter_pytorch_tpu.ops.sep_conv_pallas as scp

    blocks = [
        {'layer_size': 128, 'kernel_size': 33, 'stride': 2,
         'residual': False, 'separable': True},   # stride 2: unfused path
        {'layer_size': 128, 'kernel_size': 39, 'repeat': 2,
         'residual': True, 'separable': True},
        {'layer_size': 128, 'kernel_size': 13, 'dilation': 2,
         'residual': True, 'separable': True},
    ]
    rng = np.random.default_rng(4)
    feats = jnp.asarray(rng.standard_normal((2, 60, 64)).astype(np.float32))
    lens = jnp.asarray([60, 41], jnp.int32)

    model = Jasper(jasper_blocks=blocks, num_labels=29, mid_layers=3)
    monkeypatch.setenv('W2L_SEPCONV', 'xla')
    variables = model.init(jax.random.PRNGKey(0), feats, lens, train=False)
    out_ref, lens_ref = model.apply(variables, feats, lens, train=False)

    monkeypatch.setenv('W2L_SEPCONV', 'pallas')
    orig = scp._sep_fwd
    monkeypatch.setattr(
        scp, '_sep_fwd',
        lambda x, l, a, b, d, p, um, _i: orig(x, l, a, b, d, p, um, True))
    variables2 = model.init(jax.random.PRNGKey(0), feats, lens, train=False)
    assert jax.tree_util.tree_structure(
        variables2) == jax.tree_util.tree_structure(variables)
    out_f, lens_f = model.apply(variables, feats, lens, train=False)
    np.testing.assert_allclose(np.asarray(lens_f), np.asarray(lens_ref))
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)
