"""Q-value completion/normalization transforms for action selection.

These define how unvisited children's Q values are imputed and how Q values
are scaled before being combined with priors — batch-native functions over
``(tree, node_index [B]) -> [B, A]`` (node rows are fetched with the masked
one-hot gathers from ``tree.py``; XLA:TPU serializes per-row dynamic
gathers). Capability parity: the reference selects these via config
(acme/jax/muzero/config.py qtransform field; muax/policy.py defaults:
by_parent_and_siblings for MuZero, completed_by_mix_value for Gumbel
MuZero).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from muax_tpu.search.tree import Tree, batch_gather, qvalues_at


def qtransform_by_parent_and_siblings(tree: Tree, node_index: jax.Array,
                                      *, epsilon: float = 1e-8) -> jax.Array:
  """Normalize child Qs to [0,1] by the min/max over {parent value, visited
  children}; unvisited children get the minimum. Shape [B, A]."""
  qvalues = qvalues_at(tree, node_index)
  visit_counts = batch_gather(tree.children_visits, node_index)
  node_value = batch_gather(tree.node_values, node_index)      # [B]
  safe_q = jnp.where(visit_counts > 0, qvalues, node_value[:, None])
  min_value = jnp.minimum(node_value, jnp.min(safe_q, axis=-1))  # [B]
  max_value = jnp.maximum(node_value, jnp.max(safe_q, axis=-1))
  completed = jnp.where(visit_counts > 0, qvalues, min_value[:, None])
  return (completed - min_value[:, None]) / jnp.maximum(
      max_value - min_value, epsilon)[:, None]


def qtransform_by_min_max(tree: Tree, node_index: jax.Array, *,
                          min_value: float, max_value: float) -> jax.Array:
  """Fixed-range normalization; unvisited children get ``min_value``."""
  qvalues = qvalues_at(tree, node_index)
  visit_counts = batch_gather(tree.children_visits, node_index)
  completed = jnp.where(visit_counts > 0, qvalues, min_value)
  return (completed - min_value) / (max_value - min_value)


def _compute_mixed_value(raw_value, qvalues, visit_counts, prior_probs,
                         epsilon: float = 1e-8):
  """Interpolation of the raw network value with visited-children Q values,
  weighted by the prior (Gumbel MuZero paper, eq. for v_mix). Shape [B]."""
  sum_visits = jnp.sum(visit_counts, axis=-1)
  visited_probs = jnp.where(visit_counts > 0, prior_probs, 0.0)
  sum_probs = jnp.sum(visited_probs, axis=-1)
  weighted_q = jnp.sum(visited_probs * qvalues, axis=-1) / jnp.maximum(
      sum_probs, epsilon)
  return (raw_value + sum_visits * weighted_q) / (sum_visits + 1.0)


def qtransform_completed_by_mix_value(
    tree: Tree, node_index: jax.Array, *,
    value_scale: float = 0.1,
    maxvisit_init: float = 50.0,
    rescale_values: bool = True,
    use_mixed_value: bool = True,
    epsilon: float = 1e-8) -> jax.Array:
  """Complete unvisited Qs with the mixed value, optionally min-max rescale,
  then scale by (maxvisit_init + max visit) * value_scale — the sigma(q)
  monotone transform of the Gumbel MuZero paper. Shape [B, A]."""
  qvalues = qvalues_at(tree, node_index)
  visit_counts = batch_gather(tree.children_visits, node_index)
  raw_value = batch_gather(tree.node_raw_values, node_index)    # [B]
  prior_probs = jax.nn.softmax(
      batch_gather(tree.children_prior_logits, node_index), -1)
  if use_mixed_value:
    value = _compute_mixed_value(raw_value, qvalues, visit_counts,
                                 prior_probs, epsilon)
  else:
    value = raw_value
  completed = jnp.where(visit_counts > 0, qvalues, value[:, None])
  if rescale_values:
    low = jnp.min(completed, axis=-1, keepdims=True)
    high = jnp.max(completed, axis=-1, keepdims=True)
    completed = (completed - low) / jnp.maximum(high - low, epsilon)
  maxvisit = jnp.max(visit_counts, axis=-1)
  visit_scale = maxvisit_init + maxvisit
  return visit_scale[:, None] * value_scale * completed
