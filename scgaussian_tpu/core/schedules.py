"""Learning-rate schedules.

jnp re-implementation of the Plenoxels-style log-lerp decay used for the
z-val / bg-xyz learning rate (`utils/general_utils.py:35-68`). Returns a
traced-scalar function usable inside optax schedules and jitted steps.
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
    """Log-linearly interpolated (exponential) decay with optional sine delay.

    Matches `get_expon_lr_func` (`utils/general_utils.py:53-66`) including the
    step<0 / all-zero-lr disable branch.
    """

    def schedule(step):
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
        log_lerp = jnp.exp(
            jnp.log(jnp.float32(lr_init)) * (1 - t) + jnp.log(jnp.float32(lr_final)) * t
        )
        return jnp.where(step < 0, 0.0, delay_rate * log_lerp)

    return schedule
