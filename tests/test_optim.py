"""Optimizer tests: NovoGrad step-math vs a numpy oracle, SGD vs torch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
import torch

from wav2letter_pytorch_tpu import optim


def _novograd_oracle_steps(p0, grads, lr, beta1, beta2, eps, wd,
                           grad_averaging, amsgrad):
    """Pure-numpy replay of the reference update order (novograd.py:89-113)."""
    p = p0.copy()
    m = np.zeros_like(p)
    v = 0.0
    vmax = 0.0
    out = []
    for g in grads:
        g = g.copy()
        norm = float((g ** 2).sum())
        v = norm if v == 0 else beta2 * v + (1 - beta2) * norm
        if amsgrad:
            vmax = max(vmax, v)
            denom = np.sqrt(vmax) + eps
        else:
            denom = np.sqrt(v) + eps
        g = g / denom
        if wd:
            g = g + wd * p
        if grad_averaging:
            g = g * (1 - beta1)
        m = beta1 * m + g
        p = p - lr * m
        out.append(p.copy())
    return out


@pytest.mark.parametrize('wd,ga,ams', [(0.0, False, False),
                                       (0.01, False, False),
                                       (0.01, True, False),
                                       (0.0, False, True)])
def test_novograd_matches_oracle(wd, ga, ams):
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(5)]

    opt = optim.novograd(1e-2, betas=(0.95, 0.5), eps=1e-8, weight_decay=wd,
                         grad_averaging=ga, amsgrad=ams)
    params = {'w': jnp.asarray(p0)}
    state = opt.init(params)
    expected = _novograd_oracle_steps(p0.astype(np.float64),
                                      [g.astype(np.float64) for g in grads],
                                      1e-2, 0.95, 0.5, 1e-8, wd, ga, ams)
    for g, exp in zip(grads, expected):
        updates, state = opt.update({'w': jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(np.asarray(params['w']), exp,
                                   rtol=1e-5, atol=1e-6)


def test_novograd_validates_hyperparams():
    with pytest.raises(ValueError):
        optim.novograd(1e-3, betas=(1.5, 0.0))
    with pytest.raises(ValueError):
        optim.novograd(1e-3, betas=(0.9, -0.1))


def test_sgd_matches_torch():
    """Coupled weight decay + nesterov momentum, the reference's optimizer
    config (exp_lr_optimizer.yaml:2-7)."""
    rng = np.random.default_rng(1)
    p0 = rng.standard_normal((5,)).astype(np.float32)
    grads = [rng.standard_normal((5,)).astype(np.float32) for _ in range(4)]

    tp = torch.tensor(p0.copy(), requires_grad=True)
    topt = torch.optim.SGD([tp], lr=1e-2, momentum=0.9, nesterov=True,
                           weight_decay=1e-2)
    opt = optim.sgd(1e-2, momentum=0.9, nesterov=True, weight_decay=1e-2)
    params = {'w': jnp.asarray(p0)}
    state = opt.init(params)

    for g in grads:
        topt.zero_grad()
        tp.grad = torch.tensor(g)
        topt.step()
        updates, state = opt.update({'w': jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(np.asarray(params['w']),
                                   tp.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_exponential_lr_per_epoch():
    sched = optim.exponential_lr(1e-3, 0.999, steps_per_epoch=10)
    assert sched(0) == pytest.approx(1e-3)
    assert sched(9) == pytest.approx(1e-3)
    assert sched(10) == pytest.approx(1e-3 * 0.999)
    assert sched(25) == pytest.approx(1e-3 * 0.999 ** 2)


def test_one_cycle_lr_shape():
    sched = optim.one_cycle_lr(1e-3, total_steps=100)
    lrs = [float(sched(s)) for s in range(100)]
    assert lrs[0] == pytest.approx(1e-3 / 25, rel=1e-3)
    assert max(lrs) == pytest.approx(1e-3, rel=1e-2)
    assert lrs[-1] < lrs[0]


def test_novograd_trains_quadratic():
    """End-to-end sanity: NovoGrad minimizes a quadratic."""
    opt = optim.novograd(0.1, betas=(0.9, 0.5))
    params = {'w': jnp.array([3.0, -2.0])}
    state = opt.init(params)
    for _ in range(300):
        g = jax.grad(lambda p: jnp.sum(p['w'] ** 2))(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    assert float(jnp.abs(params['w']).max()) < 0.15
