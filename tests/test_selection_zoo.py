"""Selection-policy zoo: every rule finds the best arm on a bandit
(the reference exposes these via --search_policy, run_alphazero.py:292-304;
formulas at acme/tf/mcts/search.py:456-685)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muax_tpu import search as mx
from muax_tpu.search.action_selection import make_exploration_selection
from muax_tpu.search.core import search
from muax_tpu.search.tree import ROOT_INDEX


def bandit_fn(rewards):
  rewards = jnp.asarray(rewards, jnp.float32)

  def fn(params, rng, action, embedding):
    del params, rng
    batch = action.shape[0]
    out = mx.RecurrentFnOutput(
        reward=rewards[action],
        discount=jnp.zeros((batch,)),
        prior_logits=jnp.zeros((batch, rewards.shape[0])),
        value=jnp.zeros((batch,)))
    return out, embedding

  return fn


@pytest.mark.parametrize("kind", ["puct", "pucb", "ucb", "ltr", "pltr",
                                  "pnltr"])
def test_zoo_finds_best_arm(kind):
  select = make_exploration_selection(kind)
  root = mx.RootFnOutput(prior_logits=jnp.zeros((2, 3)),
                         value=jnp.zeros((2,)),
                         embedding=jnp.zeros((2, 1)))
  tree = search((), jax.random.PRNGKey(0), root=root,
                recurrent_fn=bandit_fn([0.0, 1.0, 0.2]),
                root_action_selection_fn=select,
                interior_action_selection_fn=select,
                num_simulations=40)
  visits = np.asarray(tree.children_visits[:, ROOT_INDEX])
  assert np.all(visits.argmax(-1) == 1), (kind, visits)


def test_bfs_visits_uniformly():
  select = make_exploration_selection("bfs")
  root = mx.RootFnOutput(prior_logits=jnp.zeros((1, 4)),
                         value=jnp.zeros((1,)),
                         embedding=jnp.zeros((1, 1)))
  tree = search((), jax.random.PRNGKey(0), root=root,
                recurrent_fn=bandit_fn([0.0, 1.0, 0.2, 0.4]),
                root_action_selection_fn=select,
                interior_action_selection_fn=select,
                num_simulations=16, max_depth=1)
  visits = np.asarray(tree.children_visits[0, ROOT_INDEX])
  # Breadth-first ignores values: root children visited evenly.
  assert visits.max() - visits.min() <= 1


def test_zoo_respects_root_mask():
  select = make_exploration_selection("ucb")
  invalid = jnp.asarray([[0.0, 1.0, 0.0]])
  root = mx.RootFnOutput(prior_logits=jnp.zeros((1, 3)),
                         value=jnp.zeros((1,)),
                         embedding=jnp.zeros((1, 1)))
  tree = search((), jax.random.PRNGKey(0), root=root,
                recurrent_fn=bandit_fn([0.1, 9.0, 0.2]),
                root_action_selection_fn=select,
                interior_action_selection_fn=select,
                num_simulations=20, invalid_actions=invalid)
  visits = np.asarray(tree.children_visits[0, ROOT_INDEX])
  assert visits[1] == 0
