"""The generic batched search loop: simulate -> expand -> backward.

One XLA program searches B independent trees in lockstep; the network
(``recurrent_fn``) is evaluated once per simulation on the whole batch, which
is what keeps the MXU busy. The tree walks (simulate / backward) are
*batch-native* ``while_loop``s whose bodies are one-hot masked vector ops
over the ``[B, N, ...]`` arrays (see ``tree.batch_gather``/``batch_scatter``)
— XLA:TPU serializes per-row dynamic gathers/scatters, so the masked
formulation is ~50x faster at B>=1024. All elements advance one tree level
per loop iteration; elements that reached a leaf are frozen by masks until
the deepest walker finishes.

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
from muax_tpu.search.tree import (
    ROOT_INDEX,
    UNVISITED,
    Tree,
    batch_gather,
    batch_gather2,
    batch_scatter_add,
    batch_scatter_add2,
    batch_scatter_set,
    batch_scatter_set2,
)


@struct.dataclass
class _SimulationState:
  rng: jax.Array
  node_index: jax.Array       # [B] parent of the action taken
  action: jax.Array           # [B]
  next_node_index: jax.Array  # [B]
  depth: jax.Array            # scalar level counter (lockstep descent)
  is_continuing: jax.Array    # [B]


def simulate(
    rng: jax.Array,
    tree: Tree,
    action_selection_fn: ActionSelectionFn,
    max_depth: int,
    sim: jax.Array,
) -> tuple[jax.Array, jax.Array]:
  """Descend every tree from its root until hitting an unexpanded child (or
  the depth cap). Returns (parent_index [B], action [B]).

  All batch elements walk in lockstep, one level per loop iteration; the
  walk front's depth is therefore a single scalar, and finished elements
  are frozen with ``where`` masks.
  """
  batch_size = tree.node_visits.shape[0]

  def cond(s: _SimulationState):
    return jnp.any(s.is_continuing)

  def body(s: _SimulationState):
    rng_, select_rng = jax.random.split(s.rng)
    action = action_selection_fn(select_rng, tree, s.next_node_index,
                                 s.depth, sim)
    child = batch_gather2(tree.children_index, s.next_node_index, action)
    cont = s.is_continuing
    new_node = jnp.where(cont, s.next_node_index, s.node_index)
    new_action = jnp.where(cont, action, s.action)
    new_next = jnp.where(cont, child, s.next_node_index)
    depth = s.depth + 1
    return _SimulationState(
        rng=rng_, node_index=new_node, action=new_action,
        next_node_index=new_next, depth=depth,
        is_continuing=jnp.logical_and(
            cont, jnp.logical_and(new_next != UNVISITED, depth < max_depth)))

  init = _SimulationState(
      rng=rng,
      node_index=jnp.full((batch_size,), tree_lib.NO_PARENT, jnp.int32),
      action=jnp.full((batch_size,), tree_lib.NO_PARENT, jnp.int32),
      next_node_index=jnp.full((batch_size,), ROOT_INDEX, jnp.int32),
      depth=jnp.asarray(0, jnp.int32),
      is_continuing=jnp.ones((batch_size,), jnp.bool_))
  end = jax.lax.while_loop(cond, body, init)
  return end.node_index, end.action


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
  embedding = jax.tree.map(
      lambda x: batch_gather(x, parent_index), tree.embeddings)
  step, next_embedding = recurrent_fn(params, rng, action, embedding)

  tree = update_tree_node(tree, next_node_index, step.prior_logits,
                          step.value, next_embedding)
  return tree.replace(
      parents=batch_scatter_set(tree.parents, next_node_index, parent_index),
      action_from_parent=batch_scatter_set(tree.action_from_parent,
                                           next_node_index, action),
      children_index=batch_scatter_set2(tree.children_index, parent_index,
                                        action, next_node_index),
      children_rewards=batch_scatter_set2(tree.children_rewards, parent_index,
                                          action, step.reward),
      children_discounts=batch_scatter_set2(tree.children_discounts,
                                            parent_index, action,
                                            step.discount),
  )


def update_tree_node(tree: Tree, node_index: jax.Array,
                     prior_logits: jax.Array, value: jax.Array,
                     embedding: Any) -> Tree:
  """Batched node (re)initialization with running-mean value blending."""
  count = batch_gather(tree.node_visits, node_index).astype(value.dtype)
  old_value = batch_gather(tree.node_values, node_index)
  new_value = (old_value * count + value) / (count + 1.0)
  embeddings = jax.tree.map(
      lambda full, e: batch_scatter_set(full, node_index, e),
      tree.embeddings, embedding)
  return tree.replace(
      node_visits=batch_scatter_add(tree.node_visits, node_index, 1),
      node_values=batch_scatter_set(tree.node_values, node_index, new_value),
      node_raw_values=batch_scatter_set(tree.node_raw_values, node_index,
                                        value),
      children_prior_logits=batch_scatter_set(tree.children_prior_logits,
                                              node_index, prior_logits),
      embeddings=embeddings,
  )


def backward(tree: Tree, leaf_index: jax.Array) -> Tree:
  """Propagate the new leaf values to the roots along parent pointers.

  Batch-native: every element climbs one edge per loop iteration; elements
  whose walker already reached the root are masked out.
  """

  def cond(state):
    _, _, index = state
    return jnp.any(index != ROOT_INDEX)

  def body(state):
    t, leaf_value, index = state
    active = index != ROOT_INDEX
    parent = batch_gather(t.parents, index)
    action = batch_gather(t.action_from_parent, index)
    count = batch_gather(t.node_visits, parent).astype(leaf_value.dtype)
    reward = batch_gather2(t.children_rewards, parent, action)
    discount = batch_gather2(t.children_discounts, parent, action)
    new_leaf_value = reward + discount * leaf_value
    parent_value = (batch_gather(t.node_values, parent) * count
                    + new_leaf_value) / (count + 1.0)
    child_value = batch_gather(t.node_values, index)
    t = t.replace(
        node_values=batch_scatter_set(t.node_values, parent, parent_value,
                                      active=active),
        node_visits=batch_scatter_add(t.node_visits, parent, 1,
                                      active=active),
        children_values=batch_scatter_set2(t.children_values, parent, action,
                                           child_value, active=active),
        children_visits=batch_scatter_add2(t.children_visits, parent, action,
                                           1, active=active),
    )
    leaf_value = jnp.where(active, new_leaf_value, leaf_value)
    index = jnp.where(active, parent, index)
    return t, leaf_value, index

  leaf_value = batch_gather(tree.node_values, leaf_index)
  tree, _, _ = jax.lax.while_loop(cond, body, (tree, leaf_value, leaf_index))
  return tree


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
    # One rule for all depths (MuZero PUCT handles the root mask itself).
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
    next_node_index = batch_gather2(tree_.children_index, parent_index,
                                    action)
    next_node_index = jnp.where(next_node_index == UNVISITED, sim + 1,
                                next_node_index)
    tree_ = expand(params, expand_rng, tree_, recurrent_fn, parent_index,
                   action, next_node_index)
    tree_ = backward(tree_, next_node_index)
    return rng_, tree_

  _, tree = jax.lax.fori_loop(0, num_simulations, body, (rng, tree))
  return tree
