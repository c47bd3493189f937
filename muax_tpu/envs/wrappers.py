"""Pure-function observation wrappers.

Capability parity with the reference's gym wrappers reimplemented as
in-jit state transforms:
  * ``FrameStackingEnv`` — stack/concat the last N observations
    (muax/wrappers.py:443-506),
  * ``ActionHistoryEnv`` — append a one-hot action-history vector to 1D
    observations or an action plane to image observations, MuZero-paper
    style (muax/wrappers.py:509-599).

Each wraps an ``Environment`` into another ``Environment`` whose state is
(inner state, wrapper state), so the AutoResetWrapper and rollout compose
unchanged.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import flax.struct as struct
import jax
import jax.numpy as jnp

from muax_tpu.envs.base import Environment, EnvSpec


@struct.dataclass
class StackState:
  env_state: Any
  frames: jax.Array  # [N, ...obs]


class FrameStackingEnv(Environment):
  """Stack the last ``num_frames`` observations along a new leading axis
  (``stack=True``) or concatenate along the last axis (``stack=False``)."""

  def __init__(self, env: Environment, num_frames: int = 4,
               stack: bool = True):
    self.env = env
    self.num_frames = num_frames
    self.stack = stack
    inner = env.spec
    if stack:
      obs_shape = (num_frames,) + inner.observation_shape
    else:
      obs_shape = inner.observation_shape[:-1] + (
          inner.observation_shape[-1] * num_frames,)
    self.spec = EnvSpec(observation_shape=obs_shape,
                        num_actions=inner.num_actions,
                        max_episode_steps=inner.max_episode_steps,
                        obs_dtype=inner.obs_dtype)

  def _obs(self, frames):
    if self.stack:
      return frames
    return jnp.concatenate(jnp.unstack(frames, axis=0), axis=-1)

  def reset(self, rng):
    env_state, obs = self.env.reset(rng)
    frames = jnp.repeat(obs[None], self.num_frames, axis=0)
    return StackState(env_state=env_state, frames=frames), self._obs(frames)

  def step(self, state: StackState, action):
    env_state, obs, reward, done = self.env.step(state.env_state, action)
    frames = jnp.concatenate([state.frames[1:], obs[None]], axis=0)
    return (StackState(env_state=env_state, frames=frames),
            self._obs(frames), reward, done)


@struct.dataclass
class ActionHistoryState:
  env_state: Any
  history: jax.Array  # [N] int32 most recent actions (latest last)


class ActionHistoryEnv(Environment):
  """Append the last N actions to the observation: as flattened one-hots for
  1D observations, as constant planes for image observations."""

  def __init__(self, env: Environment, num_actions_history: int = 4):
    self.env = env
    self.n = num_actions_history
    inner = env.spec
    if len(inner.observation_shape) == 1:
      obs_shape = (inner.observation_shape[0]
                   + self.n * inner.num_actions,)
    else:
      obs_shape = inner.observation_shape[:-1] + (
          inner.observation_shape[-1] + self.n,)
    self.spec = EnvSpec(observation_shape=obs_shape,
                        num_actions=inner.num_actions,
                        max_episode_steps=inner.max_episode_steps)

  def _obs(self, obs, history):
    num_actions = self.env.spec.num_actions
    if len(self.env.spec.observation_shape) == 1:
      onehots = jax.nn.one_hot(history, num_actions,
                               dtype=obs.dtype).reshape(-1)
      return jnp.concatenate([obs, onehots], axis=-1)
    planes = jnp.broadcast_to(
        history.astype(obs.dtype) / num_actions,
        obs.shape[:-1] + (self.n,))
    return jnp.concatenate([obs, planes], axis=-1)

  def reset(self, rng):
    env_state, obs = self.env.reset(rng)
    history = jnp.zeros((self.n,), jnp.int32)
    return (ActionHistoryState(env_state=env_state, history=history),
            self._obs(obs, history))

  def step(self, state: ActionHistoryState, action):
    env_state, obs, reward, done = self.env.step(state.env_state, action)
    history = jnp.concatenate(
        [state.history[1:], action[None].astype(jnp.int32)])
    return (ActionHistoryState(env_state=env_state, history=history),
            self._obs(obs, history), reward, done)


class PoolFrameStacking:
  """Frame stacking over a BATCHED env (an ``AutoResetWrapper`` or a host
  pool such as ``AtariVectorPool``): channel-concatenated last N frames,
  the acme actor-side observation stacking
  (acme/jax/muzero/builder.py:60-66) done device-side in the carry.

  Observations become ``[..., C * num_stack]`` (newest frame last); on an
  auto-reset the history refills with the post-reset frame so episodes
  never see frames from the previous episode.
  """

  def __init__(self, env, num_stack: int = 4):
    from muax_tpu.envs.base import AutoResetState
    self.env = env
    self.num_stack = num_stack
    self._AutoResetState = AutoResetState
    s = env.spec
    c = s.observation_shape[-1]
    self.spec = EnvSpec(
        observation_shape=s.observation_shape[:-1] + (c * num_stack,),
        num_actions=s.num_actions,
        max_episode_steps=s.max_episode_steps,
        obs_dtype=s.obs_dtype)
    if hasattr(env, "num_envs"):
      self.num_envs = env.num_envs
    if hasattr(env, "legal_action_mask"):
      self.legal_action_mask = (
          lambda carry: env.legal_action_mask(carry.env_state[0]))

  def _stacked(self, frames):
    # [B, N, ..., C] -> [B, ..., N*C], newest last.
    return jnp.concatenate(
        [frames[:, i] for i in range(self.num_stack)], axis=-1)

  def reset(self, rng, batch_size: int):
    inner = self.env.reset(rng, batch_size)
    frames = jnp.repeat(inner.obs[:, None], self.num_stack, axis=1)
    return self._AutoResetState(
        env_state=(inner, frames), obs=self._stacked(frames),
        episode_step=inner.episode_step,
        episode_return=inner.episode_return)

  def step(self, carry, action, rng):
    inner, frames = carry.env_state
    new_inner, reward, done, info = self.env.step(inner, action, rng)
    frames = jnp.concatenate([frames[:, 1:], new_inner.obs[:, None]],
                             axis=1)
    fresh = jnp.repeat(new_inner.obs[:, None], self.num_stack, axis=1)
    d = done.reshape((-1,) + (1,) * (frames.ndim - 1))
    frames = jnp.where(d, fresh, frames)
    new_carry = self._AutoResetState(
        env_state=(new_inner, frames), obs=self._stacked(frames),
        episode_step=new_inner.episode_step,
        episode_return=new_inner.episode_return)
    return new_carry, reward, done, info
