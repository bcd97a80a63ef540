"""Optimizers and schedules (optax), with torch-parity semantics.

``sgd`` reproduces torch.optim.SGD with momentum/nesterov and *coupled*
weight decay (decay added to the raw gradient before the momentum update),
matching the reference's default optimizer config
(configuration/optimizer/exp_lr_optimizer.yaml:2-7).
"""

from __future__ import annotations

import optax

from .novograd import novograd
from .schedules import constant_lr, exponential_lr, one_cycle_lr


def sgd(learning_rate, momentum: float = 0.0, nesterov: bool = False,
        weight_decay: float = 0.0) -> optax.GradientTransformation:
    """torch.optim.SGD semantics (coupled L2 via add_decayed_weights)."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.sgd(learning_rate,
                           momentum=momentum or None,
                           nesterov=nesterov))
    return optax.chain(*parts)


def adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01):
    return optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                       weight_decay=weight_decay)


__all__ = ['novograd', 'sgd', 'adamw', 'exponential_lr', 'one_cycle_lr',
           'constant_lr']
