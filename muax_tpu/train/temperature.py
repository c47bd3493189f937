"""Visit-count temperature schedules.

Parity: the standalone 3-stage schedule 1.0/0.5/0.25 at 50%/75%
(muax/train.py:16-23) and the acme 4-stage 1.0/0.5/0.1/0 at 20/40/60%
(acme/jax/muzero/utils.py:13-22). jit-safe (pure jnp.where chains).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def standalone_temperature(max_steps, current_step) -> jax.Array:
  frac = current_step / jnp.maximum(max_steps, 1)
  return jnp.where(frac < 0.5, 1.0, jnp.where(frac < 0.75, 0.5, 0.25))


def acme_temperature(max_steps, current_step) -> jax.Array:
  frac = current_step / jnp.maximum(max_steps, 1)
  return jnp.where(
      frac < 0.2, 1.0,
      jnp.where(frac < 0.4, 0.5, jnp.where(frac < 0.6, 0.1, 0.0)))


def schedule_temperature(schedule, max_steps, current_step) -> jax.Array:
  """Piecewise-constant from ((frac_boundary, value), ...) tuples."""
  frac = current_step / jnp.maximum(max_steps, 1)
  temp = jnp.asarray(schedule[-1][1], jnp.float32)
  for boundary, value in reversed(schedule[:-1]):
    temp = jnp.where(frac < boundary, value, temp)
  return temp
