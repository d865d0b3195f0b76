"""Learning-rate schedules.

``expon_lr`` reproduces the Plenoxels/JaxNeRF log-linear decay with optional
sine-eased delay used by the reference (``utils/general_utils.py:
get_expon_lr_func``), as a jit-traceable function of the step.
"""

from __future__ import annotations

import jax.numpy as jnp


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1_000_000):
    """Log-linear interpolated lr with optional delayed warm start.

    Returns 0 when lr_init == 0 (disabled parameter group) or step < 0,
    matching the reference helper's semantics.
    """
    step = jnp.asarray(step, jnp.float32)
    if lr_init == 0.0:
        return jnp.zeros_like(step)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1.0 - t) + jnp.log(lr_final) * t)
    lr = delay_rate * log_lerp
    return jnp.where(step < 0, 0.0, lr)
