"""stable-baselines3 bridge classes (reference:
muax/frameworks/sb3/common/policies.py:17-108 and
on_policy_algorithm.py:15-219). Importing this module requires
stable-baselines3; everything dependency-free lives in ``buffers.py``.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import numpy as np

try:
  import stable_baselines3  # noqa: F401
  from stable_baselines3.common.base_class import BaseAlgorithm
  from stable_baselines3.common.policies import BasePolicy
except ImportError as e:  # pragma: no cover - sb3 not in this image
  raise ImportError(
      "muax_tpu.adapters.sb3's policy/algorithm classes need "
      "stable-baselines3 (`pip install stable-baselines3`); "
      "MuaxRolloutBuffer has no sb3 dependency and imports without it."
  ) from e

import jax
import jax.numpy as jnp

from muax_tpu.adapters.sb3.buffers import MuaxRolloutBuffer


class MuaxPolicy(BasePolicy):
  """Bridges a muax_tpu agent (root inference + search) into the sb3
  ``predict`` contract (reference sb3/common/policies.py:17-108): accepts
  numpy observations from a VecEnv, returns numpy actions."""

  def __init__(self, observation_space, action_space, agent,
               deterministic_temperature: float = 0.0, **kwargs):
    kwargs.pop("lr_schedule", None)
    super().__init__(observation_space=observation_space,
                     action_space=action_space, **kwargs)
    self.agent = agent
    self.deterministic_temperature = deterministic_temperature
    self._rng = jax.random.PRNGKey(0)

  def prepare_obs(self, observation):
    obs = np.asarray(observation, np.float32)
    vectorized = obs.ndim > len(self.observation_space.shape)
    if not vectorized:
      obs = obs[None]
    return obs, vectorized

  def _predict(self, observation, deterministic: bool = False):
    self._rng, key = jax.random.split(self._rng)
    temperature = (self.deterministic_temperature if deterministic
                   else float(self.agent.params.temperature))
    action, _, _ = self.agent.act(key, jnp.asarray(observation),
                                  temperature=temperature)
    return np.asarray(action)

  def predict(self, observation, state=None, episode_start=None,
              deterministic: bool = False):
    observation, vectorized = self.prepare_obs(observation)
    actions = self._predict(observation, deterministic=deterministic)
    actions = np.array(actions).reshape((-1,) + self.action_space.shape)
    if not vectorized:
      actions = actions.squeeze(axis=0)
    return actions, state

  def forward(self, *args, **kwargs):  # sb3 abstract hook
    raise NotImplementedError


class OnPolicyAlgorithmMuax(BaseAlgorithm):
  """On-policy driver over an sb3 VecEnv (reference
  sb3/common/on_policy_algorithm.py:15-219): collect ``n_steps`` from
  every env into a MuaxRolloutBuffer, bootstrap truncation timeouts with
  the agent's value, compute Rn/PER weights at rollout end, then hand
  minibatches to the agent's update."""

  def __init__(self, agent, env, n_steps: int = 128, k_steps: int = 5,
               n_step_bootstrapping: int = 10, gamma: float = 0.99,
               batch_size: int = 64,
               update_fn: Optional[Callable[[Any], float]] = None,
               policy_kwargs=None, **kwargs):
    self.agent = agent
    self._custom_update = update_fn
    super().__init__(policy=MuaxPolicy, env=env, learning_rate=0.0,
                     policy_kwargs=policy_kwargs or {}, **kwargs)
    self.n_steps = n_steps
    self.batch_size = batch_size
    self.rollout_buffer = MuaxRolloutBuffer(
        buffer_size=n_steps,
        obs_shape=self.observation_space.shape,
        action_shape=self.action_space.shape,
        pi_shape=(getattr(self.action_space, "n", 0),),
        n_envs=env.num_envs, k_steps=k_steps,
        n_step_bootstrapping=n_step_bootstrapping, gamma_t=gamma)
    self._last_obs = None
    self._last_episode_starts = None

  def _setup_model(self) -> None:
    self.policy = MuaxPolicy(self.observation_space, self.action_space,
                             self.agent, **self.policy_kwargs)

  def collect_rollouts(self, env, rollout_buffer: MuaxRolloutBuffer):
    if self._last_obs is None:
      self._last_obs = env.reset()
      self._last_episode_starts = np.ones((env.num_envs,), np.float32)
    rollout_buffer.reset()
    rng = jax.random.PRNGKey(int(self.num_timesteps))
    for _ in range(self.n_steps):
      rng, key = jax.random.split(rng)
      action, pi, value = self.agent.act(
          key, jnp.asarray(self._last_obs, jnp.float32),
          with_pi=True, with_value=True)
      actions = np.asarray(action)
      new_obs, rewards, dones, infos = env.step(actions)
      # Timeout bootstrap (on_policy_algorithm.py:97-219): truncated
      # episodes get the agent's value of the terminal observation added
      # to the reward.
      for i, info in enumerate(infos):
        if (dones[i] and info.get("TimeLimit.truncated", False)
            and "terminal_observation" in info):
          term_obs = jnp.asarray(info["terminal_observation"],
                                 jnp.float32)[None]
          _, _, term_value = self.agent.act(
              key, term_obs, with_pi=True, with_value=True)
          rewards[i] += self.rollout_buffer.gamma_t * float(
              np.asarray(term_value)[0])
      rollout_buffer.add(self._last_obs, actions, rewards,
                         np.asarray(value), np.asarray(pi),
                         self._last_episode_starts)
      self._last_obs = new_obs
      self._last_episode_starts = dones.astype(np.float32)
      self.num_timesteps += env.num_envs

    rng, key = jax.random.split(rng)
    _, _, last_values = self.agent.act(
        key, jnp.asarray(self._last_obs, jnp.float32),
        with_pi=True, with_value=True)
    rollout_buffer.compute_Rn_and_weights(
        np.asarray(last_values), self._last_episode_starts)
    return True

  def train(self) -> None:
    for batch in self.rollout_buffer.get(self.batch_size):
      if self._custom_update is not None:
        self._custom_update(batch)
      else:
        self.agent.update(batch)

  def learn(self, total_timesteps: int, **kwargs):
    while self.num_timesteps < total_timesteps:
      self.collect_rollouts(self.env, self.rollout_buffer)
      self.train()
    return self
