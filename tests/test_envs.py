"""Env correctness: CartPole parity with gymnasium, Catch semantics,
auto-reset wrapper behavior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muax_tpu.envs import AutoResetWrapper, CartPole, Catch
from muax_tpu.envs.cartpole import CartPoleState


class TestCartPole:

  def test_matches_gymnasium(self):
    """Step-by-step dynamics parity with the real CartPole-v1 the reference
    trains on (README.md:99-143)."""
    gymnasium = pytest.importorskip("gymnasium")
    gym_env = gymnasium.make("CartPole-v1").unwrapped
    gym_env.reset(seed=0)
    start = np.array(gym_env.state, np.float64)

    ours = CartPole()
    state = CartPoleState(x=jnp.asarray(start[0]), x_dot=jnp.asarray(start[1]),
                          theta=jnp.asarray(start[2]),
                          theta_dot=jnp.asarray(start[3]))
    rng = np.random.RandomState(1)
    for _ in range(50):
      a = int(rng.randint(2))
      obs_gym, r_gym, term, trunc, _ = gym_env.step(a)
      state, obs, reward, done = ours.step(state, jnp.asarray(a))
      np.testing.assert_allclose(np.asarray(obs), obs_gym, rtol=1e-4,
                                 atol=1e-5)
      assert float(reward) == r_gym
      assert bool(done) == term
      if term:
        break

  def test_reset_bounds(self):
    env = CartPole()
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4,)
    assert np.all(np.abs(np.asarray(obs)) <= 0.05)


class TestCatch:

  def test_catch_and_miss(self):
    env = Catch(rows=3, columns=3)
    state, obs = env.reset(jax.random.PRNGKey(3))
    ball_col = int(state.ball_col)
    # Move the paddle onto the ball column; episode lasts rows-1 = 2 steps.
    for _ in range(2):
      paddle = int(state.paddle_col)
      a = 1 + np.sign(ball_col - paddle)
      state, obs, reward, done = env.step(state, jnp.asarray(int(a)))
    assert bool(done)
    assert float(reward) == 1.0

  def test_observation_has_two_pixels(self):
    env = Catch()
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert np.asarray(obs).sum() in (1.0, 2.0)  # ball+paddle may overlap


class TestAutoReset:

  def test_resets_on_done(self):
    env = AutoResetWrapper(Catch(rows=3, columns=3))
    carry = env.reset(jax.random.PRNGKey(0), batch_size=4)
    rng = jax.random.PRNGKey(1)
    saw_done = False
    for t in range(6):
      rng, step_rng = jax.random.split(rng)
      actions = jnp.ones(4, jnp.int32)
      carry, reward, done, info = env.step(carry, actions, step_rng)
      if np.any(np.asarray(done)):
        saw_done = True
        # After done the carried episode step must be reset.
        assert np.all(np.asarray(carry.episode_step)[np.asarray(done)] == 0)
        # New episode's ball is back at the top row.
        rows = np.asarray(carry.env_state.ball_row)
        assert np.all(rows[np.asarray(done)] == 0)
    assert saw_done

  def test_truncation_counts_as_done(self):
    env = AutoResetWrapper(CartPole())
    # Force a tiny time limit by monkeypatching the spec.
    env.spec = env.spec._replace(max_episode_steps=3)
    carry = env.reset(jax.random.PRNGKey(0), batch_size=2)
    rng = jax.random.PRNGKey(1)
    for t in range(3):
      rng, step_rng = jax.random.split(rng)
      carry, reward, done, info = env.step(
          carry, jnp.zeros(2, jnp.int32), step_rng)
    assert np.all(np.asarray(info["truncated"]) | np.asarray(done))

  def test_episode_return_accumulates(self):
    env = AutoResetWrapper(CartPole())
    carry = env.reset(jax.random.PRNGKey(0), batch_size=2)
    rng = jax.random.PRNGKey(1)
    for t in range(5):
      rng, step_rng = jax.random.split(rng)
      a = jnp.asarray([t % 2, (t + 1) % 2], jnp.int32)
      carry, reward, done, info = env.step(carry, a, step_rng)
      if not np.any(np.asarray(done)):
        np.testing.assert_allclose(np.asarray(carry.episode_return), t + 1)


class TestRegistry:
  """String env resolution (reference fit(env_id=...) parity,
  muax/train.py:26-50)."""

  def test_pure_jax_names_resolve(self):
    from muax_tpu.envs import CartPole, ConnectFour, make, registered
    assert "cartpole" in registered()
    assert isinstance(make("CartPole-v1"), CartPole)
    assert isinstance(make("cartpole"), CartPole)
    assert isinstance(make("Connect4"), ConnectFour)

  def test_unknown_without_num_envs_raises(self):
    from muax_tpu.envs import make
    import pytest as _pytest
    with _pytest.raises(ValueError, match="num_envs"):
      make("NoSuchEnv-v1")

  def test_fit_accepts_env_id_string(self):
    import jax.numpy as jnp
    from muax_tpu.config import MuZeroConfig, ReplayConfig, SearchConfig, \
        TrainConfig
    from muax_tpu.models import create_optimizer, make_mlp_networks
    from muax_tpu.train.fit import fit
    cfg = MuZeroConfig(
        search=SearchConfig(num_simulations=2),
        replay=ReplayConfig(capacity=32, min_fill=4),
        train=TrainConfig(num_envs=4, collect_steps=4, batch_size=4,
                          updates_per_iteration=1, unroll_steps=2,
                          n_bootstrap=2))
    nets = make_mlp_networks(2, embedding_dim=4, support_size=5)
    state, res = fit("CartPole-v1", nets, cfg,
                     create_optimizer("adam", 1e-3), num_iterations=2,
                     eval_every=10, log_every=10, save_best=False,
                     log_fn=lambda s: None)
    assert int(state.step) == 2
