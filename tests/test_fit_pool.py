"""Regression: ``fit`` over a host env pool (the reference's gym path,
muax/train.py:217-240) must run end-to-end — round-1 shipped a crash where
eval hardcoded 32 envs against a fixed-size pool (train/fit.py:96 +
envs/gym_adapter.py:73-75)."""
import jax
import jax.numpy as jnp
import numpy as np

from muax_tpu.config import MuZeroConfig, ReplayConfig, SearchConfig, TrainConfig
from muax_tpu.envs.base import AutoResetState, EnvSpec
from muax_tpu.models import make_mlp_networks
from muax_tpu.models.optimizers import muzero_optimizer
from muax_tpu.train.fit import fit


class FakeHostPool:
  """Minimal host pool speaking the AutoResetWrapper interface via
  io_callback (the GymVectorPool contract) — a deterministic counter env:
  obs = [t, t, t, a_prev], reward = action, episode of 5 steps."""

  def __init__(self, num_envs: int):
    self.num_envs = num_envs
    self.spec = EnvSpec(observation_shape=(4,), num_actions=2,
                        max_episode_steps=5)
    self._t = np.zeros(num_envs, np.int64)
    self.host_steps = 0

  def _host_reset_all(self):
    self._t[:] = 0
    return np.zeros((self.num_envs, 4), np.float32)

  def _host_step(self, action):
    self.host_steps += 1
    action = np.asarray(action)
    self._t += 1
    done = self._t >= 5
    self._t[done] = 0
    obs = np.tile(self._t[:, None], (1, 4)).astype(np.float32)
    obs[:, 3] = action
    return obs, action.astype(np.float32), done

  def reset(self, rng, batch_size):
    del rng
    assert batch_size == self.num_envs, (batch_size, self.num_envs)
    obs = jax.experimental.io_callback(
        self._host_reset_all,
        jax.ShapeDtypeStruct((self.num_envs, 4), jnp.float32), ordered=True)
    return AutoResetState(env_state=(), obs=obs,
                          episode_step=jnp.zeros(self.num_envs, jnp.int32),
                          episode_return=jnp.zeros(self.num_envs))

  def step(self, carry, action, rng):
    del rng
    obs, reward, done = jax.experimental.io_callback(
        self._host_step,
        (jax.ShapeDtypeStruct((self.num_envs, 4), jnp.float32),
         jax.ShapeDtypeStruct((self.num_envs,), jnp.float32),
         jax.ShapeDtypeStruct((self.num_envs,), jnp.bool_)),
        action, ordered=True)
    episode_return = carry.episode_return + reward
    new_carry = AutoResetState(
        env_state=(), obs=obs,
        episode_step=jnp.where(done, 0, carry.episode_step + 1),
        episode_return=jnp.where(done, 0.0, episode_return))
    info = {"terminated": done, "truncated": jnp.zeros_like(done),
            "episode_return": episode_return}
    return new_carry, reward, done, info


def _config(num_envs):
  return MuZeroConfig(
      search=SearchConfig(num_simulations=4),
      replay=ReplayConfig(capacity=64, min_fill=8),
      train=TrainConfig(num_envs=num_envs, collect_steps=6, batch_size=8,
                        updates_per_iteration=2, unroll_steps=2,
                        n_bootstrap=3))


def test_fit_over_pool_without_eval_env():
  """Pool-only fit: eval is skipped (not crashed) and best-model tracking
  falls back to rollout returns; eval never steps the training pool."""
  pool = FakeHostPool(num_envs=4)
  networks = make_mlp_networks(num_actions=2, embedding_dim=4,
                               support_size=5)
  logs = []
  state, results = fit(
      pool, networks, _config(4), muzero_optimizer(),
      num_iterations=3, eval_every=1, log_every=1, save_best=False,
      log_fn=logs.append)
  assert len(results["history"]) == 3
  assert all("test_G" not in h for h in results["history"])
  assert results["best_reward"] > -np.inf  # tracked from rollout returns
  assert any("eval disabled" in line for line in logs)


def test_fit_over_pool_with_dedicated_eval_env():
  """A second pool of a DIFFERENT size serves greedy eval; training pool
  host state advances only by training steps."""
  pool = FakeHostPool(num_envs=4)
  eval_pool = FakeHostPool(num_envs=2)
  networks = make_mlp_networks(num_actions=2, embedding_dim=4,
                               support_size=5)
  state, results = fit(
      pool, networks, _config(4), muzero_optimizer(),
      num_iterations=2, eval_every=1, log_every=1, save_best=False,
      eval_env=eval_pool)
  assert any("test_G" in h for h in results["history"])
  # Greedy eval (deterministic counter env, reward = action in {0, 1}).
  assert results["best_reward"] >= 0.0
  assert eval_pool.host_steps > 0
  # Training pool stepped exactly (warm-up + train) * collect_steps times.
  warm_iters = max(1, 8 // 4)
  assert pool.host_steps == (warm_iters + 2) * 6


def test_ensure_host_callback_backend_leaves_cpu_working():
  """The host-pool entry guard must leave the process on a backend where
  io_callback works (the conftest CPU backend here); the tunneled-TPU
  fallback path re-pins jax_platforms before initialization (validated
  manually on the relayed chip, where the probe returns False)."""
  import numpy as np

  import jax.experimental
  from muax_tpu.envs.gym_adapter import ensure_host_callback_backend

  result = ensure_host_callback_backend(timeout=300)
  assert result in (True, False)
  out = jax.jit(lambda: jax.experimental.io_callback(
      lambda: np.float32(7.0), jax.ShapeDtypeStruct((), jnp.float32),
      ordered=True))()
  assert float(out) == 7.0
