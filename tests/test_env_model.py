"""Learned env model + simulator search (reference acme/tf/mcts/models/*).

Mirrors the reference's own test strategy: search picks the provably
correct Catch action (search_test.py:28-95) and the simulator path is
faithful to the real env (simulator_test.py:25-90) — here fidelity is free
because the model IS the env's pure step function.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from muax_tpu.envs.catch import Catch, CatchState
from muax_tpu.models import (AZNetwork, env_model_loss,
                             make_mlp_transition_model, make_model_policy_fn,
                             make_model_update_fn, make_simulator_policy_fn,
                             model_replay_add, model_replay_init,
                             model_replay_sample)
from muax_tpu.models.env_model import ModelSearchParams

import haiku as hk


def _uniform_network(num_actions: int) -> AZNetwork:
  """Uniform-prior zero-value fake evaluation (search_test.py:38)."""
  def network(obs):
    b = obs.shape[0]
    return jnp.zeros((b, num_actions)), jnp.zeros((b,))
  return AZNetwork(network=hk.without_apply_rng(hk.transform(network)),
                   num_actions=num_actions)


def _collect_random_transitions(env, rng, num: int):
  """Roll random actions through the real env, restarting at done."""
  def step_fn(carry, step_rng):
    state, obs = carry
    a_rng, r_rng = jax.random.split(step_rng)
    action = jax.random.randint(a_rng, (), 0, env.spec.num_actions)
    new_state, new_obs, reward, done = env.step(state, action)
    fresh_state, fresh_obs = env.reset(r_rng)
    next_state = jax.tree.map(
        lambda f, c: jnp.where(done, f, c), fresh_state, new_state)
    next_obs = jnp.where(done, fresh_obs, new_obs)
    return (next_state, next_obs), (obs, action, reward, new_obs, done)

  rng, reset_rng = jax.random.split(rng)
  init = env.reset(reset_rng)
  _, transitions = jax.lax.scan(step_fn, init, jax.random.split(rng, num))
  return transitions


def test_model_replay_ring_wraparound():
  replay = model_replay_init(8, (2,))
  obs = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
  replay = model_replay_add(replay, obs, jnp.zeros(6, jnp.int32),
                            jnp.zeros(6), obs, jnp.zeros(6, bool))
  assert int(replay.size) == 6 and int(replay.cursor) == 6
  replay = model_replay_add(replay, obs, jnp.zeros(6, jnp.int32),
                            jnp.zeros(6), obs, jnp.zeros(6, bool))
  assert int(replay.size) == 8 and int(replay.cursor) == 4
  batch = model_replay_sample(replay, jax.random.PRNGKey(0), 16)
  assert batch[0].shape == (16, 2)


def test_model_learns_catch_dynamics():
  """Online SGD drives next-obs / reward / continue losses down and the
  learned model predicts the deterministic Catch transition."""
  env = Catch(rows=5, columns=5)
  model = make_mlp_transition_model(env.spec.num_actions,
                                    env.spec.observation_shape,
                                    hidden=(128, 128))
  optimizer = optax.adam(3e-3)

  obs, action, reward, next_obs, done = _collect_random_transitions(
      env, jax.random.PRNGKey(0), 2048)
  replay = model_replay_init(2048, env.spec.observation_shape)
  replay = model_replay_add(replay, obs, action, reward, next_obs, done)

  params = model.init_params(jax.random.PRNGKey(1), obs[:1])
  opt_state = optimizer.init(params)
  update = jax.jit(make_model_update_fn(model, optimizer, batch_size=256,
                                        num_sgd_steps=20))
  first_loss = None
  rng = jax.random.PRNGKey(2)
  for i in range(40):
    rng, step_rng = jax.random.split(rng)
    params, opt_state, metrics = update(params, opt_state, replay, step_rng)
    if first_loss is None:
      first_loss = float(metrics["model_loss"])
  final_loss = float(metrics["model_loss"])
  assert final_loss < first_loss * 0.1, (first_loss, final_loss)

  # One-step prediction: thresholded board matches the true transition.
  # Query an in-distribution state (paddle starts center and moves 1
  # col/step, so paddle_col=0 is first reachable at ball_row=2).
  state = CatchState(ball_row=jnp.asarray(2, jnp.int32),
                     ball_col=jnp.asarray(2, jnp.int32),
                     paddle_col=jnp.asarray(0, jnp.int32))
  o = env._obs(state)[None]
  a = jnp.asarray([2], jnp.int32)
  pred_next, pred_reward, continue_logit = model.apply(params, o, a)
  _, true_next, true_reward, true_done = env.step(state, a[0])
  np.testing.assert_array_equal((pred_next[0] > 0.5).astype(np.float32),
                                np.asarray(true_next))
  assert abs(float(pred_reward[0]) - float(true_reward)) < 0.25
  assert (float(jax.nn.sigmoid(continue_logit[0])) > 0.5) == (
      not bool(true_done))


def test_search_over_learned_model_picks_correct_action():
  """MCTS over the LEARNED model solves 2-row Catch — the MLPModel path of
  the reference's search test, batched."""
  env = Catch(rows=2, columns=5)
  model = make_mlp_transition_model(env.spec.num_actions,
                                    env.spec.observation_shape,
                                    hidden=(128, 128))
  optimizer = optax.adam(3e-3)
  obs, action, reward, next_obs, done = _collect_random_transitions(
      env, jax.random.PRNGKey(0), 2048)
  replay = model_replay_init(2048, env.spec.observation_shape)
  replay = model_replay_add(replay, obs, action, reward, next_obs, done)
  params = model.init_params(jax.random.PRNGKey(1), obs[:1])
  opt_state = optimizer.init(params)
  update = jax.jit(make_model_update_fn(model, optimizer, batch_size=256,
                                        num_sgd_steps=25))
  rng = jax.random.PRNGKey(2)
  for _ in range(40):
    rng, step_rng = jax.random.split(rng)
    params, opt_state, _ = update(params, opt_state, replay, step_rng)

  network = _uniform_network(env.spec.num_actions)
  policy_fn = jax.jit(make_model_policy_fn(
      model, network, num_simulations=100, dirichlet_fraction=0.0))
  net_params = network.init_params(jax.random.PRNGKey(3), obs[:1])

  # Ball at column 1, paddle at column 2: only LEFT (action 0) catches.
  # (In 2-row Catch every episode is one step from reset, so the training
  # distribution only contains paddle_col=2 states — query one of those.)
  search_params = ModelSearchParams(network=net_params, model=params)
  state2 = CatchState(ball_row=jnp.asarray(0, jnp.int32),
                      ball_col=jnp.asarray(1, jnp.int32),
                      paddle_col=jnp.asarray(2, jnp.int32))
  o2 = env._obs(state2)[None]
  a2, pi2, v2 = policy_fn(search_params, jax.random.PRNGKey(5), o2, 0.0)
  assert int(a2[0]) == 0, np.asarray(pi2)  # move left onto the ball
  assert float(v2[0]) > 0.0


@pytest.mark.parametrize("ball_col,paddle_col,expected", [
    (2, 3, 0),  # ball left of paddle -> move left
    (3, 2, 2),  # ball right of paddle -> move right
    (2, 2, 1),  # aligned -> stay
])
def test_simulator_search_picks_correct_action(ball_col, paddle_col,
                                               expected):
  """MCTS over the REAL env (Simulator path) on 2-row Catch — exact parity
  with search_test.py:28-95."""
  env = Catch(rows=2, columns=5)
  network = _uniform_network(env.spec.num_actions)
  params = network.init_params(jax.random.PRNGKey(0),
                               jnp.zeros((1,) + env.spec.observation_shape))
  policy_fn = jax.jit(make_simulator_policy_fn(
      env, network, num_simulations=100, dirichlet_fraction=0.0))

  state = CatchState(ball_row=jnp.asarray(0, jnp.int32),
                     ball_col=jnp.asarray(ball_col, jnp.int32),
                     paddle_col=jnp.asarray(paddle_col, jnp.int32))
  batched = jax.tree.map(lambda x: x[None], state)
  obs = env._obs(state)[None]
  action, pi, value = policy_fn(params, jax.random.PRNGKey(1),
                                batched, obs, 0.0)
  assert int(action[0]) == expected, np.asarray(pi)
  assert float(value[0]) > 0.5  # a catch (reward +1) is reachable
