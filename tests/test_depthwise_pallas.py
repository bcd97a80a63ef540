"""Pallas depthwise-conv kernel vs lax grouped conv (interpret mode).

Covers the Jasper/QuartzNet depthwise geometries (models/jasper.py
_conv_bn separable branch; reference jasper.py:198-236): odd and even
kernels, stride 2 (first block), dilation 2 (QuartzNet C2), C=64 (first
block input width), plus gradients through the custom VJP and the bf16
accumulate-in-f32 contract. Compiled-on-chip parity is gated by
scripts/run_tpu_checks.py before every bench run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wav2letter_pytorch_tpu.models.jasper import get_same_padding
from wav2letter_pytorch_tpu.ops.depthwise_pallas import (depthwise_conv1d,
                                                         depthwise_conv1d_xla)

# (B, T, C, K, stride, dilation) — every structural corner of the configs
GEOMETRIES = [
    (2, 50, 128, 33, 1, 1),   # QuartzNet B-block core
    (2, 50, 128, 32, 1, 1),   # Jasper even kernel (T_out = T + 1)
    (2, 51, 64, 33, 2, 1),    # first block: stride 2, C=64, odd T
    (1, 80, 256, 87, 1, 2),   # QuartzNet C2: dilation 2
    (2, 40, 128, 7, 2, 1),    # even T with stride (flooring tail)
    (1, 30, 384, 13, 1, 1),   # C = 3 * 128
]


def _pad(k, s, d):
    return get_same_padding(k, s, d)


@pytest.mark.parametrize('B,T,C,K,s,d', GEOMETRIES)
def test_forward_parity(B, T, C, K, s, d):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((K, C)).astype(np.float32) * 0.1)
    p = _pad(K, s, d)
    y_ref = depthwise_conv1d_xla(x, w, s, d, p)
    y = depthwise_conv1d(x, w, s, d, p, interpret=True)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('B,T,C,K,s,d', GEOMETRIES)
def test_gradient_parity(B, T, C, K, s, d):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((K, C)).astype(np.float32) * 0.1)
    p = _pad(K, s, d)

    # non-trivial cotangent via sin so every position's grad is distinct
    def f(x, w):
        return jnp.sum(jnp.sin(depthwise_conv1d(x, w, s, d, p,
                                                interpret=True)))

    def f_ref(x, w):
        return jnp.sum(jnp.sin(depthwise_conv1d_xla(x, w, s, d, p)))

    gx, gw = jax.grad(f, argnums=(0, 1))(x, w)
    gx_ref, gw_ref = jax.grad(f_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-4)


def test_bf16_in_bf16_out_f32_accumulate():
    rng = np.random.default_rng(2)
    x32 = rng.standard_normal((2, 40, 128)).astype(np.float32)
    w32 = (rng.standard_normal((33, 128)) * 0.1).astype(np.float32)
    x = jnp.asarray(x32, jnp.bfloat16)
    w = jnp.asarray(w32, jnp.bfloat16)
    y = depthwise_conv1d(x, w, 1, 1, 16, interpret=True)
    assert y.dtype == jnp.bfloat16
    y_f32 = depthwise_conv1d_xla(jnp.asarray(x, jnp.float32),
                                 jnp.asarray(w, jnp.float32), 1, 1, 16)
    # bf16 inputs, f32 accumulation: error bounded by input rounding, not
    # by a K-long accumulation chain in bf16
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_f32), rtol=2e-2, atol=2e-2)


def test_jit_and_vjp_under_jit():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 30, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((11, 128)).astype(np.float32) * 0.1)

    @jax.jit
    def step(x, w):
        loss, grads = jax.value_and_grad(
            lambda w: jnp.sum(depthwise_conv1d(x, w, 1, 1, 5,
                                               interpret=True) ** 2))(w)
        return loss, grads

    loss, grads = step(x, w)
    loss_ref = float(jnp.sum(depthwise_conv1d_xla(x, w, 1, 1, 5) ** 2))
    assert float(loss) == pytest.approx(loss_ref, rel=1e-5)
    assert grads.shape == w.shape


def test_model_parity_pallas_vs_xla_path(monkeypatch):
    """The full Jasper block stack produces identical outputs whichever
    depthwise backend MaskedConv selects (checkpoint interchangeability:
    the Pallas path registers the same Conv_0/kernel param)."""
    from wav2letter_pytorch_tpu.models import Jasper

    blocks = [
        {'layer_size': 128, 'kernel_size': 33, 'stride': 2,
         'residual': False, 'separable': True},
        {'layer_size': 128, 'kernel_size': 39, 'repeat': 2,
         'residual': True, 'separable': True},
        {'layer_size': 256, 'kernel_size': 1, 'residual': False,
         'separable': False},
    ]
    rng = np.random.default_rng(4)
    feats = jnp.asarray(rng.standard_normal((2, 60, 64)).astype(np.float32))
    lens = jnp.asarray([60, 41], jnp.int32)

    model = Jasper(jasper_blocks=blocks, num_labels=29, mid_layers=3)
    monkeypatch.setenv('W2L_DEPTHWISE', 'xla')
    variables = model.init(jax.random.PRNGKey(0), feats, lens, train=False)
    out_xla, lens_xla = model.apply(variables, feats, lens, train=False)

    # Force the Pallas path on CPU: interpret-mode kernels (the compiled
    # kernels are exercised on-chip by run_tpu_checks).
    monkeypatch.setenv('W2L_DEPTHWISE', 'pallas')
    import wav2letter_pytorch_tpu.ops.depthwise_pallas as dwp
    orig_fwd, orig_wgrad = dwp._dw_pallas, dwp._dw_pallas_wgrad
    monkeypatch.setattr(dwp, '_dw_pallas',
                        lambda x, w, s, d, p, _i: orig_fwd(x, w, s, d, p,
                                                           True))
    monkeypatch.setattr(dwp, '_dw_pallas_wgrad',
                        lambda x, g, k, s, d, p, _i: orig_wgrad(
                            x, g, k, s, d, p, True))
    variables2 = model.init(jax.random.PRNGKey(0), feats, lens, train=False)
    assert jax.tree_util.tree_structure(
        variables2) == jax.tree_util.tree_structure(variables)
    out_pl, lens_pl = model.apply(variables, feats, lens, train=False)
    np.testing.assert_allclose(np.asarray(lens_pl), np.asarray(lens_xla))
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               rtol=1e-4, atol=1e-5)
