"""Two-player game + AlphaZero self-play path."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from muax_tpu.envs.tictactoe import TicTacToe, TicTacToeState
from muax_tpu.models.az_networks import make_az_mlp
from muax_tpu.replay.buffer import replay_add, replay_init
from muax_tpu.train.selfplay import (
    AZConfig,
    az_loss,
    evaluate_vs_random,
    make_az_policy_fn,
    make_az_selfplay_fn,
    make_az_update_fn,
)


class TestTicTacToe:

  def test_win_detection(self):
    env = TicTacToe()
    state, _ = env.reset(jax.random.PRNGKey(0))
    # X: 0, 1, 2 top row; O: 3, 4.
    for a, expect_done in [(0, False), (3, False), (1, False), (4, False),
                           (2, True)]:
      state, obs, reward, done = env.step(state, jnp.asarray(a))
      assert bool(done) == expect_done
    assert float(reward) == 1.0  # X (the mover) won

  def test_draw(self):
    env = TicTacToe()
    state, _ = env.reset(jax.random.PRNGKey(0))
    # A known draw sequence.
    for a in [0, 4, 8, 1, 7, 6, 2, 5, 3]:
      state, obs, reward, done = env.step(state, jnp.asarray(a))
    assert bool(done)
    assert float(reward) == 0.0

  def test_illegal_move_loses(self):
    env = TicTacToe()
    state, _ = env.reset(jax.random.PRNGKey(0))
    state, _, _, _ = env.step(state, jnp.asarray(0))
    state, obs, reward, done = env.step(state, jnp.asarray(0))
    assert bool(done) and float(reward) == -1.0

  def test_observation_perspective(self):
    env = TicTacToe()
    state, obs0 = env.reset(jax.random.PRNGKey(0))
    state, obs1, _, _ = env.step(state, jnp.asarray(4))
    # After X plays center, O sees X's stone in the OPPONENT plane.
    assert float(obs1[1, 1, 1]) == 1.0
    assert float(obs1[1, 1, 0]) == 0.0

  def test_legal_actions(self):
    env = TicTacToe()
    state, _ = env.reset(jax.random.PRNGKey(0))
    state, _, _, _ = env.step(state, jnp.asarray(4))
    legal = np.asarray(env.legal_actions(state))
    assert legal[4] == 0.0 and legal.sum() == 8


class TestAZSearch:

  def test_search_blocks_immediate_loss(self):
    """Position: X has two in a row (0,1) with 2 open — O to move must block
    at 2 (otherwise X wins next turn)."""
    env = TicTacToe()
    network = make_az_mlp(9, hidden=(32,))
    params = network.init_params(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 3, 3, 2)))
    # Build the position: X:0, O:8, X:1 -> O to move.
    state, _ = env.reset(jax.random.PRNGKey(0))
    for a in [0, 8, 1]:
      state, *_ = env.step(state, jnp.asarray(a))
    batched = jax.tree.map(lambda x: jnp.stack([x] * 4), state)
    policy_fn = make_az_policy_fn(env, network, num_simulations=128,
                                  dirichlet_fraction=0.0)
    action, pi, value = jax.jit(policy_fn)(
        params, jax.random.PRNGKey(1), batched, 0.0)
    np.testing.assert_array_equal(np.asarray(action), 2)

  def test_search_takes_win(self):
    """X has 0,1 and it is X to move: 2 wins immediately."""
    env = TicTacToe()
    network = make_az_mlp(9, hidden=(32,))
    params = network.init_params(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 3, 3, 2)))
    state, _ = env.reset(jax.random.PRNGKey(0))
    for a in [0, 8, 1, 7]:
      state, *_ = env.step(state, jnp.asarray(a))
    batched = jax.tree.map(lambda x: jnp.stack([x] * 4), state)
    policy_fn = make_az_policy_fn(env, network, num_simulations=64,
                                  dirichlet_fraction=0.0)
    action, pi, value = jax.jit(policy_fn)(
        params, jax.random.PRNGKey(1), batched, 0.0)
    np.testing.assert_array_equal(np.asarray(action), 2)
    # Root value should be clearly positive (winning position).
    assert np.all(np.asarray(value) > 0.3)


class TestAZTraining:

  def test_selfplay_and_update(self):
    env = TicTacToe()
    network = make_az_mlp(9, hidden=(32,))
    params = network.init_params(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 3, 3, 2)))
    config = AZConfig(num_simulations=8, num_envs=8, collect_steps=10,
                      batch_size=16, replay_capacity=64)
    selfplay = jax.jit(make_az_selfplay_fn(env, network, config))
    state, _ = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(1),
                                                    8))
    state, segments, priorities, metrics = selfplay(
        params, state, jax.random.PRNGKey(2), jnp.asarray(1.0))
    assert segments.obs.shape == (8, 10, 3, 3, 2)
    assert int(metrics["episodes_finished"]) > 0

    # Outcome targets alternate sign along the game within a segment.
    replay = replay_init(64, 10, (3, 3, 2), 9)
    replay = replay_add(replay, segments, priorities)
    opt = optax.adam(1e-3)
    update = jax.jit(make_az_update_fn(network, opt, config))
    opt_state = opt.init(params)
    p2, opt_state, replay, m = update(params, opt_state, replay,
                                      jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"]))
    diff = max(float(jnp.max(jnp.abs(a - b)))
               for a, b in zip(jax.tree.leaves(params.network),
                               jax.tree.leaves(p2.network)))
    assert diff > 0

  def test_evaluate_vs_random_runs(self):
    env = TicTacToe()
    network = make_az_mlp(9, hidden=(32,))
    params = network.init_params(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 3, 3, 2)))
    score = evaluate_vs_random(env, network, params, jax.random.PRNGKey(1),
                               num_games=16, num_simulations=16)
    assert -1.0 <= score <= 1.0
    # Even an untrained net with 16-sim lookahead should not LOSE on
    # average to uniform random.
    assert score > -0.2
