"""In-tree action selection rules (batch-native).

Selection fn signature: ``fn(rng, tree, node_index [B], depth, sim) ->
action [B]`` where ``depth`` is the (scalar) level of the lockstep descent
front and ``sim`` is the simulation index (needed by the sequential-halving
root rule). Node rows are fetched with the masked one-hot gathers from
``tree.py`` — XLA:TPU serializes per-row dynamic gathers.

Capability parity: PUCT with pb_c 1.25/19652 (reference defaults at
muax/policy.py:17-30) and the Gumbel root/interior rules the reference gets
from mctx (muax/policy.py:33-47).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from muax_tpu.search import qtransforms
from muax_tpu.search.tree import (
    ROOT_INDEX,
    Tree,
    batch_gather,
    qvalues_at,
)

# fn(rng, tree, node_index [B], depth, sim) -> action [B]
ActionSelectionFn = Callable[[jax.Array, Tree, jax.Array, jax.Array,
                              jax.Array], jax.Array]


def _mask_invalid(logits: jax.Array, invalid: jax.Array) -> jax.Array:
  return jnp.where(invalid > 0, -jnp.inf, logits)


def _mask_root_invalid(score: jax.Array, tree: Tree,
                       depth: jax.Array) -> jax.Array:
  """Invalid actions are only known (and only matter) at the root."""
  return jnp.where(depth == 0, _mask_invalid(score,
                                             tree.root_invalid_actions),
                   score)


def muzero_action_selection(
    rng: jax.Array,
    tree: Tree,
    node_index: jax.Array,
    depth: jax.Array,
    sim: jax.Array,
    *,
    pb_c_init: float = 1.25,
    pb_c_base: float = 19652.0,
    qtransform=qtransforms.qtransform_by_parent_and_siblings,
) -> jax.Array:
  """PUCT: argmax_a [ Q(a) + P(a) * sqrt(N) / (1 + n(a)) * pb_c ]."""
  del sim
  visit_counts = batch_gather(tree.children_visits,
                              node_index).astype(jnp.float32)
  node_visit = batch_gather(tree.node_visits,
                            node_index).astype(jnp.float32)     # [B]
  pb_c = pb_c_init + jnp.log((node_visit + pb_c_base + 1.0) / pb_c_base)
  prior_probs = jax.nn.softmax(
      batch_gather(tree.children_prior_logits, node_index), -1)
  policy_score = (jnp.sqrt(node_visit) * pb_c)[:, None] * prior_probs / (
      visit_counts + 1.0)
  value_score = qtransform(tree, node_index)
  # Tiny uniform noise breaks ties between equal scores without perturbing
  # the ordering of distinct ones.
  noise = jax.random.uniform(rng, policy_score.shape) * 1e-7
  to_argmax = _mask_root_invalid(value_score + policy_score + noise, tree,
                                 depth)
  return jnp.argmax(to_argmax, axis=-1).astype(jnp.int32)


def gumbel_muzero_root_action_selection(
    rng: jax.Array,
    tree: Tree,
    node_index: jax.Array,
    depth: jax.Array,
    sim: jax.Array,
    *,
    table: jax.Array,  # [max_considered + 1, num_simulations] int32
    max_num_considered_actions: int,
    qtransform=qtransforms.qtransform_completed_by_mix_value,
) -> jax.Array:
  """Sequential halving: among considered actions whose visit count equals the
  scheduled count, argmax of g + logits + sigma(q-hat)."""
  del rng, depth
  visit_counts = batch_gather(tree.children_visits, node_index)
  prior_logits = batch_gather(tree.children_prior_logits, node_index)
  completed_q = qtransform(tree, node_index)
  gumbel = tree.extra_data.root_gumbel
  num_valid = jnp.sum(1 - tree.root_invalid_actions,
                      axis=-1).astype(jnp.int32)
  num_considered = jnp.minimum(max_num_considered_actions, num_valid)  # [B]
  considered_visit = jnp.take(table[:, sim], num_considered)           # [B]
  score = jnp.where(visit_counts == considered_visit[:, None],
                    gumbel + prior_logits + completed_q,
                    -jnp.inf)
  score = _mask_invalid(score, tree.root_invalid_actions)
  return jnp.argmax(score, axis=-1).astype(jnp.int32)


def gumbel_muzero_interior_action_selection(
    rng: jax.Array,
    tree: Tree,
    node_index: jax.Array,
    depth: jax.Array,
    sim: jax.Array,
    *,
    qtransform=qtransforms.qtransform_completed_by_mix_value,
) -> jax.Array:
  """Deterministic improved-policy tracking: argmax pi'(a) - n(a)/(1+N).

  Drives empirical visit proportions toward the improved policy
  softmax(logits + sigma(q-hat)) (Gumbel MuZero paper, sec. 5).
  """
  del rng, depth, sim
  visit_counts = batch_gather(tree.children_visits,
                              node_index).astype(jnp.float32)
  prior_logits = batch_gather(tree.children_prior_logits, node_index)
  completed_q = qtransform(tree, node_index)
  probs = jax.nn.softmax(prior_logits + completed_q, -1)
  to_argmax = probs - visit_counts / (
      1.0 + jnp.sum(visit_counts, axis=-1, keepdims=True))
  return jnp.argmax(to_argmax, axis=-1).astype(jnp.int32)


def make_exploration_selection(
    kind: str = "puct",
    pb_c_init: float = 1.25,
    pb_c_base: float = 19652.0,
) -> ActionSelectionFn:
  """The reference's selection-policy zoo over the batched tree.

  Semantics parity with acme/tf/mcts/search.py:456-685 (flag
  puct/pucb/ucb/ltr/pltr/pnltr/bfs in run_alphazero.py:292-304), expressed
  on raw child Q values Q(a) = r + discount * V(child) (unvisited children
  score Q=0 like the reference's fresh Node.value). Zero-prior (illegal)
  actions are masked.
  """

  def fn(rng, tree, node_index, depth, sim):
    del sim
    visit_counts = batch_gather(tree.children_visits,
                                node_index).astype(jnp.float32)
    node_visit = jnp.maximum(
        batch_gather(tree.node_visits, node_index).astype(jnp.float32),
        1.0)[:, None]                                            # [B, 1]
    priors = jax.nn.softmax(
        batch_gather(tree.children_prior_logits, node_index), -1)
    qvalues = jnp.where(visit_counts > 0, qvalues_at(tree, node_index), 0.0)
    inv_n = 1.0 / (visit_counts + 1.0)
    log_term = jnp.log(node_visit + 1e-8)

    if kind == "bfs":
      score = -visit_counts
    elif kind == "puct":
      pb_c = jnp.log((node_visit + pb_c_base + 1.0) / pb_c_base) + pb_c_init
      score = qvalues + pb_c * priors * jnp.sqrt(node_visit) * inv_n
    elif kind == "pucb":
      score = qvalues + priors * jnp.sqrt(log_term * inv_n)
    elif kind == "ucb":
      score = qvalues + jnp.sqrt(log_term * inv_n)
    elif kind == "ltr":
      score = qvalues + jnp.sqrt(node_visit * log_term) * inv_n
    elif kind == "pltr":
      score = qvalues + priors * jnp.sqrt(node_visit * log_term) * inv_n
    elif kind == "pnltr":
      pb_c = jnp.sqrt(
          jnp.log((node_visit + pb_c_base + 1.0) / pb_c_base) + pb_c_init)
      score = qvalues + pb_c * priors * jnp.sqrt(
          node_visit * log_term) * inv_n
    else:
      raise ValueError(f"unknown selection kind {kind!r}")

    if kind != "bfs":
      score = jnp.where(priors > 1e-9, score, -jnp.inf)
    score = score + jax.random.uniform(rng, score.shape) * 1e-7
    return jnp.argmax(_mask_root_invalid(score, tree, depth),
                      axis=-1).astype(jnp.int32)

  return fn


def switching_action_selection(
    root_fn: ActionSelectionFn,
    interior_fn: ActionSelectionFn,
) -> ActionSelectionFn:
  """Dispatch on depth: root rule at depth 0, interior rule below.

  ``depth`` is the scalar level of the lockstep descent, so this is one
  un-batched cond per tree level."""

  def fn(rng, tree, node_index, depth, sim):
    return jax.lax.cond(
        depth == 0,
        lambda: root_fn(rng, tree, node_index, depth, sim),
        lambda: interior_fn(rng, tree, node_index, depth, sim))

  return fn


def make_muzero_action_selection(pb_c_init: float = 1.25,
                                 pb_c_base: float = 19652.0,
                                 qtransform=qtransforms
                                 .qtransform_by_parent_and_siblings
                                 ) -> ActionSelectionFn:
  return functools.partial(muzero_action_selection, pb_c_init=pb_c_init,
                           pb_c_base=pb_c_base, qtransform=qtransform)
