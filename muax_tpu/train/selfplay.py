"""AlphaZero-style self-play training: search over the REAL game, no
learned dynamics.

The TPU-native rebuild of the reference's tf MCTS agent family
(acme/tf/mcts/{acting,learning,agent}.py + models/simulator.py): the search
"model" is the environment itself — embeddings in the tree are batched game
states, expansions step the game, and the policy/value net evaluates leaves.
Player alternation is a discount of -1 (the zero_sum_transform semantics,
search.py:452-453); terminal nodes pin the subtree value to the final
reward via discount 0.

Self-play, replay, and learning run as one jitted program over vectorized
games, replacing the 5000-actor Launchpad fan-out of
agent_distributed.py:283-546 with batch parallelism.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from muax_tpu.envs.base import Environment
from muax_tpu.models.az_networks import AZNetwork, AZParams
from muax_tpu.ops import segment_n_step_returns
from muax_tpu.replay.buffer import (replay_add, replay_init, replay_sample,
                                    replay_update_priorities)
from muax_tpu.search import RecurrentFnOutput, RootFnOutput, muzero_policy
from muax_tpu.types import Transition

_BIG_NEG = -1e9


def make_az_recurrent_fn(game: Environment, network: AZNetwork):
  """Search dynamics = the real game (simulator.py semantics)."""

  def recurrent_fn(params: AZParams, rng, action, embedding):
    del rng
    state = embedding
    new_state, obs, reward, done = jax.vmap(game.step)(state, action)
    policy_logits, value = network.apply(params, obs)
    legal = jax.vmap(game.legal_actions)(new_state)
    out = RecurrentFnOutput(
        reward=reward,
        # Player flip; terminal cuts the subtree (reward only).
        discount=jnp.where(done, 0.0, -1.0),
        prior_logits=jnp.where(legal > 0, policy_logits, _BIG_NEG),
        value=jnp.where(done, 0.0, value),
    )
    return out, new_state

  return recurrent_fn


def make_az_policy_fn(game: Environment, network: AZNetwork,
                      num_simulations: int = 64,
                      dirichlet_fraction: float = 0.25,
                      dirichlet_alpha: float = 0.3,
                      max_depth: Optional[int] = None,
                      search_policy: Optional[str] = None):
  """(params, rng, batched game state, temperature) ->
  (action, pi, root_value).

  ``search_policy`` selects an alternative in-tree selection rule from the
  zoo (puct/pucb/ucb/ltr/pltr/pnltr/bfs — the reference's --search_policy
  flag, run_alphazero.py:292-304); None keeps the MuZero PUCT with
  normalized Q values.
  """
  recurrent_fn = make_az_recurrent_fn(game, network)
  selection_override = None
  if search_policy is not None:
    from muax_tpu.search.action_selection import make_exploration_selection
    selection_override = make_exploration_selection(search_policy)

  def policy_fn(params: AZParams, rng, state, temperature):
    obs = jax.vmap(game.observation)(state)
    legal = jax.vmap(game.legal_actions)(state)
    policy_logits, value = network.apply(params, obs)
    root = RootFnOutput(
        prior_logits=jnp.where(legal > 0, policy_logits, _BIG_NEG),
        value=value, embedding=state)
    if selection_override is not None:
      from muax_tpu.search.core import search as run_search
      from muax_tpu.search.policies import (_apply_temperature,
                                            _get_logits_from_probs)
      tree = run_search(
          params, rng, root=root, recurrent_fn=recurrent_fn,
          root_action_selection_fn=selection_override,
          interior_action_selection_fn=selection_override,
          num_simulations=num_simulations, max_depth=max_depth,
          invalid_actions=1.0 - legal)
      summary = tree.summary()
      logits = _apply_temperature(
          _get_logits_from_probs(summary.visit_probs), temperature)
      action = jax.random.categorical(
          jax.random.fold_in(rng, 1), logits).astype(jnp.int32)
      return action, summary.visit_probs, summary.value
    out = muzero_policy(
        params, rng, root, recurrent_fn,
        num_simulations=num_simulations,
        invalid_actions=1.0 - legal,
        max_depth=max_depth,
        dirichlet_fraction=dirichlet_fraction,
        dirichlet_alpha=dirichlet_alpha,
        temperature=temperature)
    return out.action, out.action_weights, out.search_tree.summary().value

  return policy_fn


def az_loss(params: AZParams, batch: Transition, network: AZNetwork,
            l2_coef: float = 1e-4):
  """Policy CE toward search visits + value MSE toward the game outcome
  (AZLearner loss, acme/tf/mcts/learning.py:29-120)."""
  obs = batch.obs[:, 0]
  pi_target = batch.pi[:, 0]
  z = batch.rn[:, 0]
  policy_logits, value = network.apply(params, obs)
  policy_loss = -jnp.sum(
      jax.lax.stop_gradient(pi_target)
      * jax.nn.log_softmax(policy_logits, -1), axis=-1)
  value_loss = jnp.square(value - jax.lax.stop_gradient(z))
  l2 = l2_coef * 0.5 * sum(jnp.sum(jnp.square(p))
                           for p in jax.tree.leaves(params.network))
  per_example = policy_loss + value_loss
  total = jnp.mean(batch.weight * per_example) + l2
  metrics = {
      "loss": total,
      "policy_loss": jnp.mean(policy_loss),
      "value_loss": jnp.mean(value_loss),
      "priorities": jax.lax.stop_gradient(
          jnp.abs(value - z) ** 0.5) + 1e-6,
  }
  return total, metrics


class AZConfig(NamedTuple):
  num_simulations: int = 64
  num_envs: int = 128
  collect_steps: int = 18
  batch_size: int = 256
  updates_per_iteration: int = 4
  replay_capacity: int = 1024
  dirichlet_fraction: float = 0.25
  dirichlet_alpha: float = 0.3
  l2_coef: float = 1e-4


def make_az_selfplay_fn(game: Environment, network: AZNetwork,
                        config: AZConfig):
  """rollout(params, state, rng, temperature) — self-play over B games with
  auto-reset; both sides play the shared network. Outcome targets propagate
  backwards with sign alternation (z_t = r_t - z_{t+1})."""
  policy_fn = make_az_policy_fn(
      game, network, config.num_simulations,
      config.dirichlet_fraction, config.dirichlet_alpha)

  def selfplay(params: AZParams, state, rng, temperature):
    def step_fn(carry, rng_t):
      game_state = carry
      policy_rng, reset_rng = jax.random.split(rng_t)
      action, pi, root_value = policy_fn(params, policy_rng, game_state,
                                         temperature)
      new_state, obs, reward, done = jax.vmap(game.step)(game_state, action)
      # Auto-reset finished games.
      batch = action.shape[0]
      fresh, _ = jax.vmap(game.reset)(jax.random.split(reset_rng, batch))
      next_state = jax.tree.map(
          lambda f, c: jnp.where(
              done.reshape((batch,) + (1,) * (c.ndim - 1)), f, c),
          fresh, new_state)
      store = dict(obs=jax.vmap(game.observation)(game_state),
                   action=action, reward=reward, done=done,
                   value=root_value, pi=pi)
      return next_state, store

    rngs = jax.random.split(rng, config.collect_steps)
    state, steps = jax.lax.scan(step_fn, state, rngs)

    # z_t = r_t - z_{t+1} (discount -1) with bootstrap from search values at
    # the segment cut; recursion stops at terminals.
    z = segment_n_step_returns(
        steps["reward"], steps["value"], steps["done"].astype(jnp.float32),
        discount=-1.0, n=config.collect_steps)
    priorities = jnp.abs(steps["value"] - z) ** 0.5 + 1e-6

    to_bt = lambda x: jnp.swapaxes(x, 0, 1)
    batch = steps["action"].shape[1]
    segments = Transition(
        obs=to_bt(steps["obs"]),
        action=to_bt(steps["action"]),
        reward=to_bt(steps["reward"]),
        done=to_bt(steps["done"]),
        rn=to_bt(z),
        value=to_bt(steps["value"]),
        pi=to_bt(steps["pi"]),
        weight=jnp.ones((batch,), jnp.float32),
        mask=jnp.ones((batch, config.collect_steps), jnp.float32),
    )
    num_eps = jnp.sum(steps["done"])
    metrics = {"episodes_finished": num_eps,
               "mean_root_value": jnp.mean(steps["value"])}
    return state, segments, to_bt(priorities), metrics

  return selfplay


def make_az_update_fn(network: AZNetwork,
                      optimizer: optax.GradientTransformation,
                      config: AZConfig):
  def update(params, opt_state, replay_state, rng):
    batch, seg_idx, starts = replay_sample(replay_state, rng,
                                           config.batch_size, 1)
    grads, metrics = jax.grad(
        functools.partial(az_loss, batch=batch, network=network,
                          l2_coef=config.l2_coef), has_aux=True)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    replay_state = replay_update_priorities(replay_state, seg_idx, starts,
                                            metrics.pop("priorities"))
    return params, opt_state, replay_state, metrics

  return update


def evaluate_vs_random(game: Environment, network: AZNetwork,
                       params: AZParams, rng: jax.Array,
                       num_games: int = 128, num_simulations: int = 32):
  """Mean outcome (+1 win / 0 draw / -1 loss) of the agent against a
  uniform-random opponent, half the games as each player."""
  policy_fn = make_az_policy_fn(game, network, num_simulations,
                                dirichlet_fraction=0.0)

  @jax.jit
  def run(params, rng):
    reset_rng, play_rng = jax.random.split(rng)
    state, _ = jax.vmap(game.reset)(jax.random.split(reset_rng, num_games))
    # Games where the agent moves first (even index) or second.
    agent_is_first = jnp.arange(num_games) % 2 == 0

    def step_fn(carry, rng_t):
      game_state, outcome, finished = carry
      agent_rng, random_rng = jax.random.split(rng_t)
      to_play_first = jax.vmap(lambda s: s.to_play)(game_state) == 0
      agents_turn = to_play_first == agent_is_first

      a_agent, _, _ = policy_fn(params, agent_rng, game_state, 0.0)
      legal = jax.vmap(game.legal_actions)(game_state)
      logits = jnp.where(legal > 0, 0.0, -jnp.inf)
      a_random = jax.random.categorical(random_rng, logits)
      action = jnp.where(agents_turn, a_agent, a_random)
      new_state, _, reward, done = jax.vmap(game.step)(game_state, action)
      # Reward is from the mover's perspective.
      signed = jnp.where(agents_turn, reward, -reward)
      outcome = jnp.where(finished, outcome,
                          jnp.where(done, signed, outcome))
      finished = jnp.logical_or(finished, done)
      return (new_state, outcome, finished), ()

    (_, outcome, _), _ = jax.lax.scan(
        step_fn,
        (state, jnp.zeros(num_games), jnp.zeros(num_games, bool)),
        jax.random.split(play_rng, game.spec.max_episode_steps))
    return jnp.mean(outcome)

  return float(run(params, rng))
