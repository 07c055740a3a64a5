"""Noam LR schedule + optimizer chain with the reference's exact semantics.

Reference ``ScheduledOptim`` (scheduler.py:3-28): every step sets
``lr = d_model^-0.5 * min(step^-0.5, warmup^-1.5 * step)`` with the step
counter incremented *before* the update (first update uses step=1); the
``--lr`` CLI flag is overwritten.  Gradients are global-norm clipped to 1.0
before the optimizer (runners/train.py:26), and torch ``Adam(weight_decay)``
adds L2 to the (clipped) gradient before the moment updates — reproduced
here as ``add_decayed_weights`` ahead of ``scale_by_adam``.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def noam_schedule(d_model: int, warmup_steps: int):
    """lr(step) with optax 0-based step counts (reference is 1-based)."""
    init_lr = float(d_model) ** -0.5
    warmup = float(warmup_steps)

    def schedule(step):
        s = step + 1.0  # reference increments before use
        return init_lr * jnp.minimum(s**-0.5, warmup**-1.5 * s)

    return schedule


def make_optimizer(
    d_model: int,
    warmup_steps: int,
    *,
    beta1: float = 0.9,
    beta2: float = 0.99,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
    clip_norm: float = 1.0,
) -> optax.GradientTransformation:
    """clip(1.0) -> L2 weight decay -> Adam moments -> Noam LR (defaults from
    main.py:34-38 and runners/train.py:26)."""
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps),
        optax.scale_by_schedule(noam_schedule(d_model, warmup_steps)),
        optax.scale(-1.0),
    )
