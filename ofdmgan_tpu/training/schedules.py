"""Optimizers and LR schedules for CWGAN-GP training.

Reference recipe (config/config.yaml:62-92, train.py:114-135): Adam with
betas (0.0, 0.9) for both nets, StepLR halving every ``step_size`` epochs.
Here the schedule is expressed in optimizer-update counts (optax), so the
trainer converts epochs -> updates (the critic sees ``n_critic`` updates per
outer step).
"""

from __future__ import annotations

import optax


def step_lr(base_lr: float, updates_per_decay: int, gamma: float = 0.5) -> optax.Schedule:
    """StepLR equivalent: lr * gamma^(floor(count / updates_per_decay))."""
    return optax.exponential_decay(
        init_value=base_lr,
        transition_steps=max(1, updates_per_decay),
        decay_rate=gamma,
        staircase=True,
    )


def make_adam(
    lr: float,
    betas=(0.0, 0.9),
    updates_per_decay: int | None = None,
    gamma: float = 0.5,
) -> optax.GradientTransformation:
    """WGAN-GP Adam (b1=0, b2=0.9 — train.py:114-123) with optional StepLR."""
    schedule = lr if updates_per_decay is None else step_lr(lr, updates_per_decay, gamma)
    return optax.adam(learning_rate=schedule, b1=betas[0], b2=betas[1])
