"""Learning-rate schedules.

`expon_lr` reproduces the JaxNeRF-style log-linear interpolation with optional
delayed cosine warmup that the reference uses for xyz and pose learning rates
(utils/general_utils.py:29-62 `get_expon_lr_func`); `cosine_lr` matches the
global-aligner schedule (dust3r/cloud_opt/commons.py `cosine_schedule`).

All schedules are jnp-traceable functions of the step so they can live inside
a jitted training loop.
"""

from __future__ import annotations

import jax.numpy as jnp


def expon_lr(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
):
    """Log-linear lr interpolation with optional delayed start.

    Returns a function step -> lr. Matches the reference semantics exactly,
    including returning 0.0 when step < 0 or both lr endpoints are 0.
    """

    def helper(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        if lr_init == 0.0 and lr_final == 0.0:
            return jnp.zeros_like(step)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
        lr = delay_rate * log_lerp
        return jnp.where(step < 0, 0.0, lr)

    return helper


def cosine_lr(lr_base: float, lr_min: float, max_steps: int):
    """Cosine decay from lr_base to lr_min over max_steps (global aligner)."""

    def helper(step):
        t = jnp.clip(jnp.asarray(step, jnp.float32) / max(max_steps - 1, 1), 0.0, 1.0)
        return lr_min + (lr_base - lr_min) * (1 + jnp.cos(t * jnp.pi)) / 2

    return helper


def linear_lr(lr_base: float, lr_min: float, max_steps: int):
    """Linear decay from lr_base to lr_min (global aligner alternative)."""

    def helper(step):
        t = jnp.clip(jnp.asarray(step, jnp.float32) / max(max_steps - 1, 1), 0.0, 1.0)
        return lr_base * (1 - t) + lr_min * t

    return helper
