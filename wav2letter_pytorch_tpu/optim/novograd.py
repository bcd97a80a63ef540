"""NovoGrad optimizer as an optax GradientTransformation.

Exact semantics of the reference's NVIDIA port (/root/reference/novograd.py:
52-115), replicated operation-for-operation:

* per-parameter **scalar** second moment from the gradient norm^2:
  first step copies ||g||^2, then v <- beta2*v + (1-beta2)*||g||^2
  (novograd.py:91-96);
* optional AMSGrad running max (novograd.py:98-102);
* normalized gradient g/(sqrt(v)+eps), then decoupled-style weight decay
  added to the normalized gradient (novograd.py:106-108);
* optional grad averaging x(1-beta1) (novograd.py:109-110);
* momentum m <- beta1*m + g, SGD-style apply p <- p - lr*m
  (novograd.py:111-113). Default betas (0.95, 0).
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


class NovogradState(NamedTuple):
    count: chex.Array          # step counter (for lr schedules)
    exp_avg: optax.Updates     # first moment, shaped like params
    exp_avg_sq: optax.Updates  # scalar second moment per leaf
    max_exp_avg_sq: optax.Updates  # scalar AMSGrad max per leaf


def novograd(learning_rate, betas=(0.95, 0.0), eps: float = 1e-8,
             weight_decay: float = 0.0, grad_averaging: bool = False,
             amsgrad: bool = False) -> optax.GradientTransformation:
    """Layer-wise adaptive NovoGrad. ``learning_rate``: float or schedule."""
    beta1, beta2 = betas
    if not 0.0 <= beta1 < 1.0:
        raise ValueError(f'Invalid beta parameter at index 0: {beta1}')
    if not 0.0 <= beta2 < 1.0:
        raise ValueError(f'Invalid beta parameter at index 1: {beta2}')
    if eps < 0.0:
        raise ValueError(f'Invalid epsilon value: {eps}')

    def init_fn(params):
        zeros_scalar = jax.tree.map(lambda p: jnp.zeros((), p.dtype), params)
        return NovogradState(
            count=jnp.zeros((), jnp.int32),
            exp_avg=jax.tree.map(jnp.zeros_like, params),
            exp_avg_sq=zeros_scalar,
            max_exp_avg_sq=jax.tree.map(lambda p: jnp.zeros((), p.dtype), params),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError('novograd requires params for weight decay')

        def moment(g, v):
            norm = jnp.sum(jnp.square(g))
            # First step copies the norm (reference novograd.py:93-95).
            return jnp.where(v == 0, norm, beta2 * v + (1 - beta2) * norm)

        new_v = jax.tree.map(moment, updates, state.exp_avg_sq)
        if amsgrad:
            new_vmax = jax.tree.map(jnp.maximum, state.max_exp_avg_sq, new_v)
            denom_tree = new_vmax
        else:
            new_vmax = state.max_exp_avg_sq
            denom_tree = new_v

        def direction(g, v, p, m):
            d = g / (jnp.sqrt(v) + eps)
            if weight_decay != 0:
                d = d + weight_decay * p
            if grad_averaging:
                d = d * (1 - beta1)
            return beta1 * m + d

        new_m = jax.tree.map(direction, updates, denom_tree, params,
                             state.exp_avg)
        count = state.count + 1
        lr = learning_rate(state.count) if callable(learning_rate) \
            else learning_rate
        out = jax.tree.map(lambda m: -lr * m, new_m)
        return out, NovogradState(count, new_m, new_v, new_vmax)

    return optax.GradientTransformation(init_fn, update_fn)
