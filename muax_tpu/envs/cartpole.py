"""Pure-JAX CartPole-v1 (classic control, Barto-Sutton-Anderson dynamics).

Matches the gymnasium CartPole-v1 environment semantics the reference trains
on (README.md:99-143): Euler integration at tau=0.02, termination at
|x| > 2.4 or |theta| > 12 degrees, reward 1 per step, 500-step limit.
"""
from __future__ import annotations

import flax.struct as struct
import jax
import jax.numpy as jnp

from muax_tpu.envs.base import Environment, EnvSpec

_GRAVITY = 9.8
_MASSCART = 1.0
_MASSPOLE = 0.1
_TOTAL_MASS = _MASSCART + _MASSPOLE
_LENGTH = 0.5  # half pole length
_POLEMASS_LENGTH = _MASSPOLE * _LENGTH
_FORCE_MAG = 10.0
_TAU = 0.02
_THETA_LIMIT = 12 * 2 * jnp.pi / 360
_X_LIMIT = 2.4


@struct.dataclass
class CartPoleState:
  x: jax.Array
  x_dot: jax.Array
  theta: jax.Array
  theta_dot: jax.Array


class CartPole(Environment):

  spec = EnvSpec(observation_shape=(4,), num_actions=2,
                 max_episode_steps=500)

  def reset(self, rng: jax.Array):
    vals = jax.random.uniform(rng, (4,), minval=-0.05, maxval=0.05)
    state = CartPoleState(x=vals[0], x_dot=vals[1], theta=vals[2],
                          theta_dot=vals[3])
    return state, self._obs(state)

  def step(self, state: CartPoleState, action: jax.Array):
    force = jnp.where(action == 1, _FORCE_MAG, -_FORCE_MAG)
    cos_t = jnp.cos(state.theta)
    sin_t = jnp.sin(state.theta)
    temp = (force + _POLEMASS_LENGTH * state.theta_dot**2 * sin_t
            ) / _TOTAL_MASS
    theta_acc = (_GRAVITY * sin_t - cos_t * temp) / (
        _LENGTH * (4.0 / 3.0 - _MASSPOLE * cos_t**2 / _TOTAL_MASS))
    x_acc = temp - _POLEMASS_LENGTH * theta_acc * cos_t / _TOTAL_MASS

    new = CartPoleState(
        x=state.x + _TAU * state.x_dot,
        x_dot=state.x_dot + _TAU * x_acc,
        theta=state.theta + _TAU * state.theta_dot,
        theta_dot=state.theta_dot + _TAU * theta_acc,
    )
    done = jnp.logical_or(jnp.abs(new.x) > _X_LIMIT,
                          jnp.abs(new.theta) > _THETA_LIMIT)
    reward = jnp.asarray(1.0, jnp.float32)
    return new, self._obs(new), reward, done

  @staticmethod
  def _obs(state: CartPoleState) -> jax.Array:
    return jnp.stack([state.x, state.x_dot, state.theta, state.theta_dot]
                     ).astype(jnp.float32)
