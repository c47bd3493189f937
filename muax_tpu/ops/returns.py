"""Bootstrapped return targets, fully vectorized for on-device batches.

Capability parity with the reference's ``n_step_bootstrapped_returns``
(muax/utils.py:170-219 and acme/jax/muzero/utils.py:100-149) and the
episode-start-aware vectorized variant
(muax/frameworks/sb3/common/buffers.py:154-181).

All are backward ``lax.scan`` implementations — O(T) with no Python loops —
and broadcast over arbitrary leading batch dims via ``jax.vmap``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def n_step_bootstrapped_returns(
    r_t: jax.Array,
    discount_t: jax.Array,
    v_t: jax.Array,
    n: int,
    lambda_t: float | jax.Array = 1.0,
    stop_target_gradients: bool = True,
) -> jax.Array:
  """n-step lambda-bootstrapped return targets along the last time axis.

  Computes, for each t:  G_t = r_t + d_t * [(1-l) v_t + l * G_{t+1}]
  truncated at n steps ahead by bootstrapping with v.

  Args:
    r_t: rewards [T] at times 1..T.
    discount_t: discounts [T] at times 1..T (0 at terminal).
    v_t: values [T] estimated at times 1..T (bootstrap values).
    n: number of steps to accumulate before bootstrapping.
    lambda_t: lambda mixing parameter (1.0 = pure n-step).

  Returns:
    Targets [T].
  """
  seq_len = r_t.shape[-1]
  lambda_t = jnp.ones_like(discount_t) * lambda_t

  # Pad with n-1 copies of the final bootstrap value / zero rewards so that
  # every position can look n steps ahead.
  pad = n - 1
  r_t = jnp.concatenate([r_t, jnp.zeros(r_t.shape[:-1] + (pad,), r_t.dtype)], -1)
  discount_t = jnp.concatenate(
      [discount_t, jnp.ones(discount_t.shape[:-1] + (pad,), discount_t.dtype)], -1)
  lambda_t = jnp.concatenate(
      [lambda_t, jnp.ones(lambda_t.shape[:-1] + (pad,), lambda_t.dtype)], -1)
  v_t = jnp.concatenate(
      [v_t, jnp.repeat(v_t[..., -1:], pad, axis=-1)], -1)

  # Work backwards: at offset i from the horizon, refresh targets at the
  # bootstrap points. Standard trick: iterate n times over the full sequence,
  # each pass extending the recursion one step deeper.
  targets = v_t[..., n - 1:]
  for i in reversed(range(n)):
    r_ = r_t[..., i:i + seq_len]
    d_ = discount_t[..., i:i + seq_len]
    l_ = lambda_t[..., i:i + seq_len]
    v_ = v_t[..., i:i + seq_len]
    targets = r_ + d_ * ((1.0 - l_) * v_ + l_ * targets)

  if stop_target_gradients:
    targets = jax.lax.stop_gradient(targets)
  return targets


@functools.partial(jax.jit, static_argnames=("n",))
def batched_n_step_returns(r: jax.Array, d: jax.Array, v: jax.Array, n: int,
                           lambda_t: float = 1.0) -> jax.Array:
  """vmap of :func:`n_step_bootstrapped_returns` over a leading batch dim."""
  fn = lambda r_, d_, v_: n_step_bootstrapped_returns(r_, d_, v_, n, lambda_t)
  return jax.vmap(fn)(r, d, v)


def segment_n_step_returns(
    rewards: jax.Array,
    values: jax.Array,
    dones: jax.Array,
    discount: float,
    n: int,
    lambda_t: float = 1.0,
) -> jax.Array:
  """Episode-boundary-aware n-step returns for auto-reset rollout segments.

  Matches the semantics of the reference's ``compute_Rn_and_weights``
  (sb3/common/buffers.py:154-181): the recursion never crosses a terminal —
  at a done step the target is just the reward (discount masked to 0), and
  positions whose n-step window is cut short bootstrap with the value at the
  cut.

  Args:
    rewards: [T] or [T, B] rewards observed after acting at t.
    values: [T] or [T, B] search values at t (used to bootstrap).
    dones: [T] or [T, B] terminal flags for the step taken at t.
    discount: scalar discount gamma.
    n: bootstrap horizon.

  Returns:
    Rn targets, same shape as rewards.
  """
  d = (1.0 - dones.astype(rewards.dtype)) * discount
  # The value used to bootstrap position t+n is the stored search value there.
  # Shift values one step ahead: the bootstrap for the window starting at t is
  # v_{t+n}, and n_step_bootstrapped_returns consumes v at times 1..T, i.e.
  # v_t[i] bootstraps after taking reward r[i]. So pass values shifted left.
  v_next = jnp.concatenate([values[1:], values[-1:]], axis=0)
  if rewards.ndim == 1:
    return n_step_bootstrapped_returns(rewards, d, v_next, n, lambda_t)
  fn = lambda r_, d_, v_: n_step_bootstrapped_returns(r_, d_, v_, n, lambda_t)
  return jax.vmap(fn, in_axes=1, out_axes=1)(rewards, d, v_next)
