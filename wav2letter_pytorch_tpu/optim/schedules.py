"""Learning-rate schedules with torch.optim.lr_scheduler parity.

The reference config uses ExponentialLR(gamma=0.999) stepped once per epoch
by Lightning (configuration/optimizer/exp_lr_optimizer.yaml:8-10), with a
commented OneCycleLR alternative. Schedules here are optax-style
step -> lr callables; epoch-granular schedules take ``steps_per_epoch``.
"""

from __future__ import annotations

import optax


def exponential_lr(init_lr: float, gamma: float, steps_per_epoch: int = 1):
    """lr = init_lr * gamma^epoch (torch ExponentialLR, per-epoch stepping)."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return init_lr * gamma ** epoch

    return schedule


def one_cycle_lr(max_lr: float, total_steps: int, pct_start: float = 0.3,
                 div_factor: float = 25.0, final_div_factor: float = 1e4):
    """torch OneCycleLR defaults (cos anneal) via optax's onecycle."""
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps, peak_value=max_lr, pct_start=pct_start,
        div_factor=div_factor, final_div_factor=final_div_factor)


def constant_lr(lr: float):
    def schedule(step):
        return lr

    return schedule
