"""The generic batched search loop: simulate -> expand -> backward.

One XLA program searches B independent trees in lockstep; the network
(``recurrent_fn``) is evaluated once per simulation on the whole batch, which
is what keeps the MXU busy. Per-element tree walking (simulate / backward) is
vmapped ``while_loop``s over the array tree.

This is the composable core the policies in ``policies.py`` build on — the
seam the reference relies on mctx for (SURVEY.md §2i native-dependency
inventory) and that its custom diffusion policy demonstrates the need for
(acme/jax/diffusion_muzero/policy.py:20-213).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.struct as struct
import jax
import jax.numpy as jnp

from muax_tpu.search import tree as tree_lib
from muax_tpu.search.action_selection import ActionSelectionFn
from muax_tpu.search.types import RecurrentFn, RootFnOutput
from muax_tpu.search.tree import ROOT_INDEX, UNVISITED, Tree


@struct.dataclass
class _SimulationState:
  rng: jax.Array
  node_index: jax.Array    # parent of the action taken
  action: jax.Array
  next_node_index: jax.Array
  depth: jax.Array
  is_continuing: jax.Array


def simulate(
    rng: jax.Array,
    tree: Tree,
    action_selection_fn: ActionSelectionFn,
    max_depth: int,
    sim: jax.Array,
) -> tuple[jax.Array, jax.Array]:
  """Descend every tree from its root until hitting an unexpanded child (or
  the depth cap). Returns (parent_index [B], action [B])."""

  def simulate_one(rng_, tree_):
    def cond(s: _SimulationState):
      return s.is_continuing

    def body(s: _SimulationState):
      rng_, select_rng = jax.random.split(s.rng)
      node = s.next_node_index
      action = action_selection_fn(select_rng, tree_, node, s.depth, sim)
      child = tree_.children_index[node, action]
      depth = s.depth + 1
      return _SimulationState(
          rng=rng_, node_index=node, action=action, next_node_index=child,
          depth=depth,
          is_continuing=jnp.logical_and(child != UNVISITED,
                                        depth < max_depth))

    init = _SimulationState(
        rng=rng_,
        node_index=jnp.asarray(tree_lib.NO_PARENT, jnp.int32),
        action=jnp.asarray(tree_lib.NO_PARENT, jnp.int32),
        next_node_index=jnp.asarray(ROOT_INDEX, jnp.int32),
        depth=jnp.asarray(0, jnp.int32),
        is_continuing=jnp.asarray(True))
    end = jax.lax.while_loop(cond, body, init)
    return end.node_index, end.action

  batch_size = tree.node_visits.shape[0]
  rngs = jax.random.split(rng, batch_size)
  return jax.vmap(simulate_one)(rngs, tree)


def expand(
    params: Any,
    rng: jax.Array,
    tree: Tree,
    recurrent_fn: RecurrentFn,
    parent_index: jax.Array,
    action: jax.Array,
    next_node_index: jax.Array,
) -> Tree:
  """Evaluate the model once on the whole batch and install the new nodes."""
  batch_range = jnp.arange(parent_index.shape[0])
  embedding = jax.tree.map(
      lambda x: x[batch_range, parent_index], tree.embeddings)
  step, next_embedding = recurrent_fn(params, rng, action, embedding)

  tree = update_tree_node(tree, next_node_index, step.prior_logits,
                          step.value, next_embedding)
  return tree.replace(
      parents=tree.parents.at[batch_range, next_node_index].set(parent_index),
      action_from_parent=tree.action_from_parent
      .at[batch_range, next_node_index].set(action),
      children_index=tree.children_index
      .at[batch_range, parent_index, action].set(next_node_index),
      children_rewards=tree.children_rewards
      .at[batch_range, parent_index, action].set(step.reward),
      children_discounts=tree.children_discounts
      .at[batch_range, parent_index, action].set(step.discount),
  )


def update_tree_node(tree: Tree, node_index: jax.Array,
                     prior_logits: jax.Array, value: jax.Array,
                     embedding: Any) -> Tree:
  """Batched node (re)initialization with running-mean value blending."""
  batch_range = jnp.arange(node_index.shape[0])
  count = tree.node_visits[batch_range, node_index].astype(value.dtype)
  new_value = (tree.node_values[batch_range, node_index] * count + value) / (
      count + 1.0)
  embeddings = jax.tree.map(
      lambda full, e: full.at[batch_range, node_index].set(e),
      tree.embeddings, embedding)
  return tree.replace(
      node_visits=tree.node_visits.at[batch_range, node_index].add(1),
      node_values=tree.node_values.at[batch_range, node_index].set(new_value),
      node_raw_values=tree.node_raw_values
      .at[batch_range, node_index].set(value),
      children_prior_logits=tree.children_prior_logits
      .at[batch_range, node_index].set(prior_logits),
      embeddings=embeddings,
  )


def backward(tree: Tree, leaf_index: jax.Array) -> Tree:
  """Propagate the new leaf value to the root along parent pointers."""

  def backward_one(tree_, leaf):
    def cond(state):
      _, _, index = state
      return index != ROOT_INDEX

    def body(state):
      t, leaf_value, index = state
      parent = t.parents[index]
      action = t.action_from_parent[index]
      count = t.node_visits[parent].astype(leaf_value.dtype)
      reward = t.children_rewards[parent, action]
      leaf_value = reward + t.children_discounts[parent, action] * leaf_value
      parent_value = (t.node_values[parent] * count + leaf_value) / (
          count + 1.0)
      t = t.replace(
          node_values=t.node_values.at[parent].set(parent_value),
          node_visits=t.node_visits.at[parent].add(1),
          children_values=t.children_values
          .at[parent, action].set(t.node_values[index]),
          children_visits=t.children_visits.at[parent, action].add(1),
      )
      return t, leaf_value, parent

    leaf_value = tree_.node_values[leaf]
    out_tree, _, _ = jax.lax.while_loop(
        cond, body, (tree_, leaf_value, leaf))
    return out_tree

  return jax.vmap(backward_one)(tree, leaf_index)


def search(
    params: Any,
    rng: jax.Array,
    *,
    root: RootFnOutput,
    recurrent_fn: RecurrentFn,
    root_action_selection_fn: ActionSelectionFn,
    interior_action_selection_fn: ActionSelectionFn,
    num_simulations: int,
    max_depth: Optional[int] = None,
    invalid_actions: Optional[jax.Array] = None,
    extra_data: Any = (),
) -> Tree:
  """Run ``num_simulations`` batched simulations from ``root``.

  Selection dispatches root vs interior rule by depth; each simulation
  expands exactly one node per batch element into slot ``sim`` (unless the
  depth cap re-visits an existing node, which is then re-evaluated).
  """
  batch_size, num_actions = root.prior_logits.shape
  if max_depth is None:
    max_depth = num_simulations
  if invalid_actions is None:
    invalid_actions = jnp.zeros((batch_size, num_actions),
                                root.prior_logits.dtype)

  from muax_tpu.search.action_selection import switching_action_selection
  if root_action_selection_fn is interior_action_selection_fn:
    # One rule for all depths (MuZero PUCT handles the root mask itself):
    # dropping the batched cond avoids evaluating both branches per
    # descent step under vmap.
    action_selection_fn = root_action_selection_fn
  else:
    action_selection_fn = switching_action_selection(
        root_action_selection_fn, interior_action_selection_fn)

  tree = tree_lib.instantiate_tree_from_root(
      root, num_simulations, invalid_actions, extra_data)

  def body(sim, carry):
    rng_, tree_ = carry
    rng_, simulate_rng, expand_rng = jax.random.split(rng_, 3)
    parent_index, action = simulate(simulate_rng, tree_, action_selection_fn,
                                    max_depth, sim)
    # Slot for this simulation's node; if the depth cap stopped the descent at
    # an already-expanded child, reuse (and re-evaluate) that node.
    batch_range = jnp.arange(batch_size)
    next_node_index = tree_.children_index[batch_range, parent_index, action]
    next_node_index = jnp.where(next_node_index == UNVISITED, sim + 1,
                                next_node_index)
    tree_ = expand(params, expand_rng, tree_, recurrent_fn, parent_index,
                   action, next_node_index)
    tree_ = backward(tree_, next_node_index)
    return rng_, tree_

  _, tree = jax.lax.fori_loop(0, num_simulations, body, (rng, tree))
  return tree
