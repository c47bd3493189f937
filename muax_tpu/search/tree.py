"""Array-of-structs search tree, batched over the leading axis.

The whole forest lives in fixed-shape device arrays ``[B, N, ...]`` so that
every phase of the search (simulate / expand / backward) is a batched XLA
program — no per-node Python objects (contrast: the reference's dict-based
``Node`` trees at acme/tf/mcts/search.py). One node slot is consumed per
simulation, so capacity N = num_simulations + 1 with the root in slot 0.
"""
from __future__ import annotations

from typing import Any, ClassVar

import flax.struct as struct
import jax
import jax.numpy as jnp


ROOT_INDEX = 0
NO_PARENT = -1
UNVISITED = -1


# ---------------------------------------------------------------------------
# Batched node addressing.
#
# XLA:TPU lowers per-row dynamic gathers/scatters (``x[arange(B), idx]`` /
# ``x.at[arange(B), idx].set``) to a serialized loop over the batch — ~100us
# per op at B=1024, which dominated the whole search. These helpers express
# the same access as one-hot masked vector ops over [B, N, ...], which the
# VPU executes in a few microseconds and XLA fuses with neighbors.
# ---------------------------------------------------------------------------


def _node_mask(idx: jax.Array, n: int) -> jax.Array:
  """[B] indices -> [B, n] boolean one-hot rows (all-False for idx out of
  range, e.g. NO_PARENT)."""
  return idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None]


def batch_gather(x: jax.Array, idx: jax.Array) -> jax.Array:
  """x [B, N, ...], idx [B] -> x[b, idx[b]] as [B, ...]."""
  mask = _node_mask(idx, x.shape[1])
  m = mask.reshape(mask.shape + (1,) * (x.ndim - 2))
  summed = jnp.sum(jnp.where(m, x, jnp.zeros((), x.dtype)), axis=1)
  return summed.astype(x.dtype)


def batch_gather2(x: jax.Array, idx: jax.Array, sub: jax.Array) -> jax.Array:
  """x [B, N, A, ...], idx [B], sub [B] -> x[b, idx[b], sub[b]]."""
  return batch_gather(batch_gather(x, idx), sub)


def batch_scatter_set(x: jax.Array, idx: jax.Array, v: jax.Array,
                      active: jax.Array | None = None) -> jax.Array:
  """x [B, N, ...] with x[b, idx[b]] <- v[b]; rows with active[b]=False are
  left untouched."""
  mask = _node_mask(idx, x.shape[1])
  if active is not None:
    mask = jnp.logical_and(mask, active[:, None])
  m = mask.reshape(mask.shape + (1,) * (x.ndim - 2))
  return jnp.where(m, jnp.expand_dims(v, 1), x)


def batch_scatter_add(x: jax.Array, idx: jax.Array, v,
                      active: jax.Array | None = None) -> jax.Array:
  """x [B, N, ...] with x[b, idx[b]] += v."""
  mask = _node_mask(idx, x.shape[1])
  if active is not None:
    mask = jnp.logical_and(mask, active[:, None])
  m = mask.reshape(mask.shape + (1,) * (x.ndim - 2))
  return x + jnp.where(m, jnp.asarray(v, x.dtype), jnp.zeros((), x.dtype))


def _node_action_mask(x: jax.Array, idx: jax.Array, action: jax.Array,
                      active: jax.Array | None) -> jax.Array:
  mask = jnp.logical_and(_node_mask(idx, x.shape[1])[:, :, None],
                         _node_mask(action, x.shape[2])[:, None, :])
  if active is not None:
    mask = jnp.logical_and(mask, active[:, None, None])
  return mask.reshape(mask.shape + (1,) * (x.ndim - 3))


def batch_scatter_set2(x: jax.Array, idx: jax.Array, action: jax.Array,
                       v: jax.Array,
                       active: jax.Array | None = None) -> jax.Array:
  """x [B, N, A, ...] with x[b, idx[b], action[b]] <- v[b]."""
  m = _node_action_mask(x, idx, action, active)
  v = jnp.asarray(v)
  if v.ndim > 0:  # [B, ...] -> [B, 1, 1, ...]
    v = v.reshape(v.shape[:1] + (1, 1) + v.shape[1:])
  return jnp.where(m, v, x)


def batch_scatter_add2(x: jax.Array, idx: jax.Array, action: jax.Array, v,
                       active: jax.Array | None = None) -> jax.Array:
  """x [B, N, A, ...] with x[b, idx[b], action[b]] += v."""
  m = _node_action_mask(x, idx, action, active)
  return x + jnp.where(m, jnp.asarray(v, x.dtype), jnp.zeros((), x.dtype))


def qvalues_at(tree: "Tree", node_index: jax.Array) -> jax.Array:
  """Batched child Q values r + discount * V(child) at node_index [B] ->
  [B, A]."""
  return (batch_gather(tree.children_rewards, node_index)
          + batch_gather(tree.children_discounts, node_index)
          * batch_gather(tree.children_values, node_index))


@struct.dataclass
class Tree:
  """Batched search tree. All leaves have leading dims [B, N] or [B, N, A].

  Inside ``jax.vmap`` the same class describes a single unbatched tree
  ([N] / [N, A] leaves) — all helper methods are written per-element.
  """
  node_visits: jax.Array            # [B, N] int32
  node_values: jax.Array            # [B, N] f32 — running mean backup value
  node_raw_values: jax.Array        # [B, N] f32 — network value at expansion
  parents: jax.Array                # [B, N] int32
  action_from_parent: jax.Array     # [B, N] int32
  children_index: jax.Array         # [B, N, A] int32 (UNVISITED = -1)
  children_prior_logits: jax.Array  # [B, N, A] f32
  children_visits: jax.Array        # [B, N, A] int32
  children_rewards: jax.Array       # [B, N, A] f32
  children_discounts: jax.Array     # [B, N, A] f32
  children_values: jax.Array        # [B, N, A] f32
  embeddings: Any                   # pytree with [B, N, ...] leaves
  root_invalid_actions: jax.Array   # [B, A] f32 (1 = invalid)
  extra_data: Any                   # policy-specific (e.g. root gumbel noise)

  ROOT_INDEX: ClassVar[int] = ROOT_INDEX
  NO_PARENT: ClassVar[int] = NO_PARENT
  UNVISITED: ClassVar[int] = UNVISITED

  @property
  def num_actions(self) -> int:
    return self.children_index.shape[-1]

  @property
  def num_simulations(self) -> int:
    return self.children_index.shape[-2] - 1

  def qvalues(self, node_index) -> jax.Array:
    """Per-element child Q values: r + discount * V(child). Shape [A]."""
    return (self.children_rewards[node_index]
            + self.children_discounts[node_index]
            * self.children_values[node_index])

  def summary(self) -> "SearchSummary":
    """Per-element root statistics (call on an unbatched or batched tree)."""
    visit_counts = self.children_visits[..., ROOT_INDEX, :].astype(jnp.float32)
    total = jnp.sum(visit_counts, axis=-1, keepdims=True)
    visit_probs = visit_counts / jnp.maximum(total, 1.0)
    visit_probs = jnp.where(total > 0, visit_probs,
                            1.0 / self.num_actions)
    return SearchSummary(
        visit_counts=visit_counts,
        visit_probs=visit_probs,
        value=self.node_values[..., ROOT_INDEX],
        qvalues=(self.children_rewards[..., ROOT_INDEX, :]
                 + self.children_discounts[..., ROOT_INDEX, :]
                 * self.children_values[..., ROOT_INDEX, :]),
    )


@struct.dataclass
class SearchSummary:
  visit_counts: jax.Array
  visit_probs: jax.Array
  value: jax.Array
  qvalues: jax.Array


def instantiate_tree_from_root(
    root,
    num_simulations: int,
    root_invalid_actions: jax.Array,
    extra_data: Any,
) -> Tree:
  """Allocate a batched tree and install the (already evaluated) root."""
  batch_size, num_actions = root.prior_logits.shape
  num_nodes = num_simulations + 1
  dtype = root.prior_logits.dtype

  def zeros_like_expanded(x):
    return jnp.zeros((batch_size, num_nodes) + x.shape[1:], x.dtype)

  embeddings = jax.tree.map(zeros_like_expanded, root.embedding)
  embeddings = jax.tree.map(
      lambda full, r: full.at[:, ROOT_INDEX].set(r), embeddings,
      root.embedding)

  tree = Tree(
      node_visits=jnp.zeros((batch_size, num_nodes), jnp.int32)
      .at[:, ROOT_INDEX].set(1),
      node_values=jnp.zeros((batch_size, num_nodes), dtype)
      .at[:, ROOT_INDEX].set(root.value),
      node_raw_values=jnp.zeros((batch_size, num_nodes), dtype)
      .at[:, ROOT_INDEX].set(root.value),
      parents=jnp.full((batch_size, num_nodes), NO_PARENT, jnp.int32),
      action_from_parent=jnp.full((batch_size, num_nodes), NO_PARENT,
                                  jnp.int32),
      children_index=jnp.full((batch_size, num_nodes, num_actions),
                              UNVISITED, jnp.int32),
      children_prior_logits=jnp.zeros(
          (batch_size, num_nodes, num_actions), dtype)
      .at[:, ROOT_INDEX].set(root.prior_logits),
      children_visits=jnp.zeros((batch_size, num_nodes, num_actions),
                                jnp.int32),
      children_rewards=jnp.zeros((batch_size, num_nodes, num_actions), dtype),
      children_discounts=jnp.zeros((batch_size, num_nodes, num_actions),
                                   dtype),
      children_values=jnp.zeros((batch_size, num_nodes, num_actions), dtype),
      embeddings=embeddings,
      root_invalid_actions=root_invalid_actions,
      extra_data=extra_data,
  )
  return tree
