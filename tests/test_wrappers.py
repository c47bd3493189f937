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
