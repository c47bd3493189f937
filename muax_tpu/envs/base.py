"""Functional in-jit environment API.

Environments are pure functions over explicit state pytrees so that thousands
of instances step in lockstep inside ``jit``/``vmap``/``scan`` — the
TPU-native replacement for the reference's one-host-env-per-process actors
(SURVEY §2i actor-parallelism row). The 5-tuple step semantics of gym are
preserved as (state, obs, reward, done) with auto-reset layered on top.
"""
from __future__ import annotations

import abc
from typing import Any, NamedTuple, Tuple

import flax.struct as struct
import jax
import jax.numpy as jnp


class EnvSpec(NamedTuple):
  observation_shape: Tuple[int, ...]
  num_actions: int
  max_episode_steps: int
  # Storage dtype of observations (None = float32). Integer-frame envs
  # (uint8 pixels, the reference's ALE convention) declare it here so the
  # replay ring stores raw bytes — 4x less HBM gather traffic at the
  # conv family's SPI=32 density — and the networks up-cast on entry.
  obs_dtype: Any = None


class Environment(abc.ABC):
  """Single-instance pure env; batching is applied by the caller via vmap."""

  spec: EnvSpec

  @abc.abstractmethod
  def reset(self, rng: jax.Array):
    """rng -> (state, obs)"""

  @abc.abstractmethod
  def step(self, state, action):
    """(state, action) -> (state, obs, reward, done)

    ``done`` covers both termination and time-limit truncation (the
    reference's episode loop ends on either, train.py:191-197).
    """


@struct.dataclass
class AutoResetState:
  env_state: Any
  obs: jax.Array
  episode_step: jax.Array   # int32
  episode_return: jax.Array  # f32 accumulated return (for monitoring)


class AutoResetWrapper:
  """Batched auto-reset: a done env is immediately re-seeded in place.

  The post-step observation exposed for storage is the *new* episode's first
  observation, matching the semantics of vectorized rollout buffers
  (reference sb3/common/on_policy_algorithm.py:97-219).
  """

  def __init__(self, env: Environment):
    self.env = env
    self.spec = env.spec

  def legal_action_mask(self, carry: "AutoResetState"):
    """[B, A] float mask (1=legal) for the CURRENT obs, or None.

    Envs advertise legality by defining ``legal_actions(state)`` (e.g.
    TicTacToe); the rollout turns this into ``invalid_actions`` for the
    search (the reference reads legals from OpenSpielNode,
    acme/tf/mcts/search.py:321-356)."""
    if hasattr(self.env, "legal_actions"):
      return jax.vmap(self.env.legal_actions)(carry.env_state)
    return None

  def reset(self, rng: jax.Array, batch_size: int) -> AutoResetState:
    rngs = jax.random.split(rng, batch_size)
    state, obs = jax.vmap(self.env.reset)(rngs)
    return AutoResetState(
        env_state=state,
        obs=obs,
        episode_step=jnp.zeros(batch_size, jnp.int32),
        episode_return=jnp.zeros(batch_size, jnp.float32),
    )

  def step(self, carry: AutoResetState, action: jax.Array, rng: jax.Array):
    """Returns (new_carry, reward, done, info dict)."""
    batch_size = action.shape[0]
    state, obs, reward, terminated = jax.vmap(self.env.step)(
        carry.env_state, action)
    episode_step = carry.episode_step + 1
    truncated = episode_step >= self.spec.max_episode_steps
    done = jnp.logical_or(terminated, truncated)

    reset_rngs = jax.random.split(rng, batch_size)
    fresh_state, fresh_obs = jax.vmap(self.env.reset)(reset_rngs)

    def select(fresh, cur):
      d = done.reshape((batch_size,) + (1,) * (cur.ndim - 1))
      return jnp.where(d, fresh, cur)

    episode_return = carry.episode_return + reward
    new_carry = AutoResetState(
        env_state=jax.tree.map(select, fresh_state, state),
        obs=select(fresh_obs, obs),
        episode_step=jnp.where(done, 0, episode_step),
        episode_return=jnp.where(done, 0.0, episode_return),
    )
    info = {
        "terminated": terminated,
        "truncated": truncated,
        "episode_return": episode_return,  # valid where done
    }
    return new_carry, reward, done, info
