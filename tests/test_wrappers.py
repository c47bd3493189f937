"""Observation wrappers and monitor."""
import jax
import jax.numpy as jnp
import numpy as np

from muax_tpu.envs import AutoResetWrapper, CartPole, Catch
from muax_tpu.envs.wrappers import ActionHistoryEnv, FrameStackingEnv
from muax_tpu.monitor import TrainMonitor


class TestFrameStacking:

  def test_stack_shapes(self):
    env = FrameStackingEnv(CartPole(), num_frames=4, stack=True)
    assert env.spec.observation_shape == (4, 4)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, 4)
    # All frames identical at reset.
    np.testing.assert_array_equal(np.asarray(obs[0]), np.asarray(obs[-1]))

  def test_concat_mode(self):
    env = FrameStackingEnv(Catch(rows=3, columns=3), num_frames=2,
                           stack=False)
    assert env.spec.observation_shape == (3, 6)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (3, 6)

  def test_frames_shift(self):
    env = FrameStackingEnv(CartPole(), num_frames=3)
    state, obs0 = env.reset(jax.random.PRNGKey(0))
    state, obs1, _, _ = env.step(state, jnp.asarray(1))
    # Oldest two frames of obs1 = newest two of obs0 pattern: obs1[:-1]
    # should contain obs0's trailing frames.
    np.testing.assert_array_equal(np.asarray(obs1[0]), np.asarray(obs0[1]))
    np.testing.assert_array_equal(np.asarray(obs1[1]), np.asarray(obs0[2]))

  def test_composes_with_autoreset(self):
    wrapped = AutoResetWrapper(FrameStackingEnv(CartPole(), 2))
    carry = wrapped.reset(jax.random.PRNGKey(0), 4)
    carry, r, d, _ = wrapped.step(carry, jnp.zeros(4, jnp.int32),
                                  jax.random.PRNGKey(1))
    assert carry.obs.shape == (4, 2, 4)


class TestActionHistory:

  def test_vector_obs(self):
    env = ActionHistoryEnv(CartPole(), num_actions_history=3)
    assert env.spec.observation_shape == (4 + 3 * 2,)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (10,)
    state, obs, _, _ = env.step(state, jnp.asarray(1))
    # Newest action one-hot is at the tail.
    np.testing.assert_array_equal(np.asarray(obs[-2:]), [0.0, 1.0])

  def test_image_obs(self):
    # Catch obs is 2D [3, 3]; the wrapper appends action planes on the
    # trailing axis.
    env = ActionHistoryEnv(Catch(3, 3), num_actions_history=2)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (3, 3 + 2)
    state, obs, _, _ = env.step(state, jnp.asarray(2))
    np.testing.assert_allclose(np.asarray(obs[:, -1]), 2.0 / 3.0)


class TestMonitor:

  def test_counters_and_flush(self):
    mon = TrainMonitor()
    mon.observe_rollout(num_steps=100, episodes_finished=2,
                        mean_episode_return=10.0)
    mon.record_metrics({"loss": 1.0})
    mon.record_metrics({"loss": 3.0})
    out = mon.flush()
    assert out["T"] == 100 and out["ep"] == 2
    assert out["loss"] == 2.0
    assert out["avg_G"] == 10.0

  def test_counter_save_load(self, tmp_path):
    mon = TrainMonitor()
    mon.observe_rollout(50, 1, 5.0)
    path = str(tmp_path / "counters.pkl.gz")
    mon.save_counters(path)
    mon2 = TrainMonitor().load_counters(path)
    assert mon2.T == 50 and mon2.ep == 1 and mon2.G == 5.0


class TestPoolFrameStacking:
  """Batched frame stacking over pools/AutoResetWrapper (the acme
  actor-side observation stacking, builder.py:60-66) — the device-side
  half of the Atari path."""

  def _env(self):
    from muax_tpu.envs import AutoResetWrapper, PixelCatch, PoolFrameStacking
    return PoolFrameStacking(
        AutoResetWrapper(PixelCatch(rows=3, columns=3, scale=1)),
        num_stack=4)

  def test_shapes_and_initial_fill(self):
    env = self._env()
    assert env.spec.observation_shape == (3, 3, 4)
    carry = env.reset(jax.random.PRNGKey(0), 5)
    assert carry.obs.shape == (5, 3, 3, 4)
    # All stack slots hold the reset frame initially.
    np.testing.assert_array_equal(np.asarray(carry.obs[..., 0]),
                                  np.asarray(carry.obs[..., 3]))

  def test_newest_frame_last_and_history_shifts(self):
    env = self._env()
    carry = env.reset(jax.random.PRNGKey(0), 4)
    first = np.asarray(carry.obs[..., 3])
    carry2, _, done, _ = env.step(
        carry, jnp.ones(4, jnp.int32), jax.random.PRNGKey(1))
    live = ~np.asarray(done)
    # Previous newest frame slid into slot 2 for episodes that continued.
    np.testing.assert_array_equal(np.asarray(carry2.obs[..., 2])[live],
                                  first[live])

  def test_done_refills_history(self):
    from muax_tpu.envs import AutoResetWrapper, PixelCatch, PoolFrameStacking
    env = PoolFrameStacking(
        AutoResetWrapper(PixelCatch(rows=2, columns=3, scale=1)),
        num_stack=3)
    carry = env.reset(jax.random.PRNGKey(0), 8)
    rng = jax.random.PRNGKey(1)
    for t in range(3):  # rows=2 Catch terminates within 2 steps
      rng, k = jax.random.split(rng)
      carry, _, done, _ = env.step(carry, jnp.zeros(8, jnp.int32), k)
      d = np.asarray(done)
      if d.any():
        obs = np.asarray(carry.obs)
        # Every stack slot equals the fresh post-reset frame.
        np.testing.assert_array_equal(obs[d][..., 0], obs[d][..., 2])
        return
    raise AssertionError("no episode terminated in 3 steps of 2-row Catch")

  def test_composes_with_rollout(self):
    from muax_tpu.config import MuZeroConfig, ReplayConfig, SearchConfig, \
        TrainConfig
    from muax_tpu.models import make_mlp_networks
    from muax_tpu.train.actor import make_rollout_fn
    env = self._env()
    config = MuZeroConfig(
        search=SearchConfig(num_simulations=2),
        replay=ReplayConfig(capacity=16),
        train=TrainConfig(num_envs=4, collect_steps=5, batch_size=4,
                          unroll_steps=2, n_bootstrap=2))
    networks = make_mlp_networks(3, embedding_dim=4, support_size=5)
    rollout = jax.jit(make_rollout_fn(networks, env, config))
    params = networks.init_params(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 3, 3, 4)))
    carry = env.reset(jax.random.PRNGKey(1), 4)
    carry, segments, priorities, metrics = rollout(
        params, carry, jax.random.PRNGKey(2), 1.0)
    assert segments.obs.shape == (4, 5, 3, 3, 4)
    assert np.isfinite(float(metrics["mean_root_value"]))
