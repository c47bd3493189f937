"""Behavioral tests for the batched search engine (SURVEY §4 level 2):
known-optimal-action toy MDPs, tree-invariant checks, masking, policies.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muax_tpu import search as mx
from muax_tpu.search import seq_halving
from muax_tpu.search.tree import ROOT_INDEX


def bandit_recurrent_fn(rewards, discount=0.0):
  """Deterministic bandit: reward depends only on the action; episode ends."""
  rewards = jnp.asarray(rewards, jnp.float32)
  num_actions = rewards.shape[0]

  def fn(params, rng, action, embedding):
    del params, rng
    batch = action.shape[0]
    out = mx.RecurrentFnOutput(
        reward=rewards[action],
        discount=jnp.full((batch,), discount, jnp.float32),
        prior_logits=jnp.zeros((batch, num_actions), jnp.float32),
        value=jnp.zeros((batch,), jnp.float32),
    )
    return out, embedding

  return fn


def uniform_root(batch, num_actions, value=0.0):
  return mx.RootFnOutput(
      prior_logits=jnp.zeros((batch, num_actions), jnp.float32),
      value=jnp.full((batch,), value, jnp.float32),
      embedding=jnp.zeros((batch, 1), jnp.float32),
  )


class TestMuZeroPolicy:

  def test_finds_best_arm(self):
    rewards = [0.0, 1.0, 0.2, 0.5]
    out = mx.muzero_policy(
        params=(), rng=jax.random.PRNGKey(0),
        root=uniform_root(4, 4),
        recurrent_fn=bandit_recurrent_fn(rewards),
        num_simulations=64,
        dirichlet_fraction=0.0,
        temperature=0.0)
    np.testing.assert_array_equal(np.asarray(out.action), 1)
    # Visit mass should concentrate on the best arm.
    assert np.all(np.asarray(out.action_weights[:, 1]) > 0.4)

  def test_tree_invariants(self):
    num_simulations = 32
    out = mx.muzero_policy(
        params=(), rng=jax.random.PRNGKey(1),
        root=uniform_root(2, 3),
        recurrent_fn=bandit_recurrent_fn([0.1, 0.2, 0.3], discount=0.9),
        num_simulations=num_simulations)
    tree = out.search_tree
    # Root visited once at init plus once per simulation.
    np.testing.assert_array_equal(
        np.asarray(tree.node_visits[:, ROOT_INDEX]), num_simulations + 1)
    # Child visit counts at root sum to num_simulations.
    np.testing.assert_array_equal(
        np.asarray(jnp.sum(tree.children_visits[:, ROOT_INDEX], -1)),
        num_simulations)
    # Every expanded node's parent/action pointers are consistent.
    t0 = jax.tree.map(lambda x: np.asarray(x[0]), tree)
    for node in range(1, num_simulations + 1):
      if t0.node_visits[node] == 0:
        continue
      parent = t0.parents[node]
      action = t0.action_from_parent[node]
      assert t0.children_index[parent, action] == node

  def test_root_value_is_mean_backup(self):
    # With discount 0 and zero leaf values, root value must equal the mean
    # of the rewards received over simulations.
    out = mx.muzero_policy(
        params=(), rng=jax.random.PRNGKey(2),
        root=uniform_root(1, 2, value=0.0),
        recurrent_fn=bandit_recurrent_fn([0.0, 1.0]),
        num_simulations=50, dirichlet_fraction=0.0)
    tree = out.search_tree
    visits = np.asarray(tree.children_visits[0, ROOT_INDEX], np.float64)
    rewards = np.array([0.0, 1.0])
    expected = np.sum(visits * rewards) / (np.sum(visits) + 1.0)
    np.testing.assert_allclose(
        np.asarray(tree.node_values[0, ROOT_INDEX]), expected, rtol=1e-5)

  def test_invalid_actions_never_selected(self):
    invalid = jnp.array([[0.0, 1.0, 0.0, 1.0]] * 3)
    out = mx.muzero_policy(
        params=(), rng=jax.random.PRNGKey(3),
        root=uniform_root(3, 4),
        recurrent_fn=bandit_recurrent_fn([0.0, 10.0, 0.1, 10.0]),
        num_simulations=40, invalid_actions=invalid)
    tree = out.search_tree
    root_visits = np.asarray(tree.children_visits[:, ROOT_INDEX])
    assert np.all(root_visits[:, 1] == 0)
    assert np.all(root_visits[:, 3] == 0)
    assert np.all(np.asarray(out.action_weights)[:, [1, 3]] == 0)
    assert np.all(np.isin(np.asarray(out.action), [0, 2]))

  def test_max_depth(self):
    # Chain MDP with reward only deeper than the cap: depth-1 cap means the
    # search only ever expands root children.
    def fn(params, rng, action, embedding):
      del params, rng
      batch = action.shape[0]
      out = mx.RecurrentFnOutput(
          reward=jnp.zeros((batch,)),
          discount=jnp.ones((batch,)),
          prior_logits=jnp.zeros((batch, 2)),
          value=jnp.zeros((batch,)))
      return out, embedding

    out = mx.muzero_policy(
        params=(), rng=jax.random.PRNGKey(4),
        root=uniform_root(1, 2),
        recurrent_fn=fn, num_simulations=10, max_depth=1)
    tree = out.search_tree
    # Only the two root children can ever be expanded (then re-evaluated).
    expanded = np.asarray(tree.node_visits[0] > 0)
    assert expanded.sum() <= 3  # root + 2 children

  def test_jit_and_temperature(self):
    policy = jax.jit(functools.partial(
        mx.muzero_policy,
        recurrent_fn=bandit_recurrent_fn([0.0, 1.0]),
        num_simulations=16, temperature=0.0, dirichlet_fraction=0.0))
    out = policy((), jax.random.PRNGKey(0), uniform_root(2, 2))
    np.testing.assert_array_equal(np.asarray(out.action), 1)

  def test_two_player_sign_flip(self):
    """Negative discount implements zero-sum player alternation: a move that
    is great for the opponent one ply deep must score badly at the root."""

    def fn(params, rng, action, embedding):
      del params, rng
      batch = action.shape[0]
      # Action 0 leads to a state worth +1 *to the player at that node* (the
      # opponent); action 1 leads to 0.
      value = jnp.where(action == 0, 1.0, 0.0)
      out = mx.RecurrentFnOutput(
          reward=jnp.zeros((batch,)),
          discount=jnp.full((batch,), -1.0),
          prior_logits=jnp.zeros((batch, 2)),
          value=value)
      return out, embedding

    out = mx.muzero_policy(
        params=(), rng=jax.random.PRNGKey(5),
        root=uniform_root(2, 2),
        recurrent_fn=fn, num_simulations=30,
        dirichlet_fraction=0.0, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(out.action), 1)


class TestGumbelPolicy:

  def test_finds_best_arm(self):
    out = mx.gumbel_muzero_policy(
        params=(), rng=jax.random.PRNGKey(0),
        root=uniform_root(8, 4),
        recurrent_fn=bandit_recurrent_fn([0.0, 0.1, 1.0, 0.2]),
        num_simulations=32)
    np.testing.assert_array_equal(np.asarray(out.action), 2)

  def test_weights_are_improved_policy(self):
    out = mx.gumbel_muzero_policy(
        params=(), rng=jax.random.PRNGKey(1),
        root=uniform_root(4, 3),
        recurrent_fn=bandit_recurrent_fn([0.0, 1.0, 0.5]),
        num_simulations=24)
    w = np.asarray(out.action_weights)
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)
    assert np.all(w[:, 1] > w[:, 0])
    assert np.all(w[:, 1] > w[:, 2])

  def test_respects_invalid_actions(self):
    invalid = jnp.array([[0.0, 1.0, 0.0]] * 4)
    out = mx.gumbel_muzero_policy(
        params=(), rng=jax.random.PRNGKey(2),
        root=uniform_root(4, 3),
        recurrent_fn=bandit_recurrent_fn([0.2, 5.0, 0.6]),
        num_simulations=16, invalid_actions=invalid)
    assert np.all(np.asarray(out.action) != 1)
    tree = out.search_tree
    assert np.all(np.asarray(tree.children_visits[:, ROOT_INDEX, 1]) == 0)

  def test_few_simulations(self):
    # Fewer sims than actions: sequential halving must still work.
    out = mx.gumbel_muzero_policy(
        params=(), rng=jax.random.PRNGKey(3),
        root=uniform_root(2, 8),
        recurrent_fn=bandit_recurrent_fn([0.0] * 7 + [1.0]),
        num_simulations=4)
    assert out.action.shape == (2,)


class TestSeqHalving:

  def test_sequence_properties(self):
    seq = seq_halving.considered_visit_sequence(16, 32)
    assert len(seq) == 32
    assert seq[0] == 0
    # Phase structure: visits are non-decreasing within consideration sets.
    table = seq_halving.considered_visit_table(16, 32)
    assert table.shape == (17, 32)

  def test_two_actions(self):
    seq = seq_halving.considered_visit_sequence(2, 10)
    # With 2 actions considered the whole budget alternates between them.
    assert seq == (0, 0, 1, 1, 2, 2, 3, 3, 4, 4)


class TestStochasticPolicy:

  def _make_fns(self, num_actions=3, num_chance=2):
    def decision_fn(params, rng, action, state):
      del params, rng
      batch = action.shape[0]
      out = mx.DecisionRecurrentFnOutput(
          chance_logits=jnp.zeros((batch, num_chance)),
          afterstate_value=jnp.zeros((batch,)))
      # Afterstate remembers the action taken.
      return out, state + action[:, None].astype(jnp.float32)

    def chance_fn(params, rng, outcome, afterstate):
      del params, rng
      batch = outcome.shape[0]
      # Reward = stored action value; best decision action is the largest.
      out = mx.ChanceRecurrentFnOutput(
          action_logits=jnp.zeros((batch, num_actions)),
          value=jnp.zeros((batch,)),
          reward=afterstate[:, 0],
      )
      return out, afterstate

    return decision_fn, chance_fn

  def test_decision_chance_interleaving(self):
    decision_fn, chance_fn = self._make_fns()
    out = mx.stochastic_muzero_policy(
        params=(), rng=jax.random.PRNGKey(0),
        root=uniform_root(2, 3),
        decision_recurrent_fn=decision_fn,
        chance_recurrent_fn=chance_fn,
        num_simulations=128, num_chance_outcomes=2,
        dirichlet_fraction=0.0, temperature=0.0, discount=0.5)
    # Reward equals the decision action -> best decision is 2.
    np.testing.assert_array_equal(np.asarray(out.action), 2)
    assert out.action_weights.shape == (2, 3)
    np.testing.assert_allclose(
        np.asarray(out.action_weights).sum(-1), 1.0, rtol=1e-5)

  def test_levels_alternate(self):
    decision_fn, chance_fn = self._make_fns()
    out = mx.stochastic_muzero_policy(
        params=(), rng=jax.random.PRNGKey(1),
        root=uniform_root(1, 3),
        decision_recurrent_fn=decision_fn,
        chance_recurrent_fn=chance_fn,
        num_simulations=20, num_chance_outcomes=2)
    tree = out.search_tree
    is_dec = np.asarray(tree.embeddings.is_decision_node[0])
    visits = np.asarray(tree.node_visits[0])
    parents = np.asarray(tree.parents[0])
    for node in range(1, 21):
      if visits[node] == 0:
        continue
      parent = parents[node]
      # Node type must alternate along every edge.
      assert is_dec[node] != is_dec[parent]


class TestBatchIndependence:

  def test_batch_elements_independent(self):
    """Each batch element searches its own MDP: rewards differ per element
    via the embedding, and each must find its own best arm."""

    def fn(params, rng, action, embedding):
      del params, rng
      batch = action.shape[0]
      # Best arm index is stored in the embedding.
      best = embedding[:, 0].astype(jnp.int32)
      reward = jnp.where(action == best, 1.0, 0.0)
      out = mx.RecurrentFnOutput(
          reward=reward,
          discount=jnp.zeros((batch,)),
          prior_logits=jnp.zeros((batch, 4)),
          value=jnp.zeros((batch,)))
      return out, embedding

    root = mx.RootFnOutput(
        prior_logits=jnp.zeros((4, 4)),
        value=jnp.zeros((4,)),
        embedding=jnp.array([[0.0], [1.0], [2.0], [3.0]]))
    out = mx.muzero_policy(
        params=(), rng=jax.random.PRNGKey(0), root=root,
        recurrent_fn=fn, num_simulations=48,
        dirichlet_fraction=0.0, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(out.action), [0, 1, 2, 3])
