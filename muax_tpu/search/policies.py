"""Search policies: MuZero, Gumbel MuZero, Stochastic MuZero.

Capability parity with the three policies the reference wraps from mctx
(muax/policy.py:13-67) plus the decision/chance interleaving of the acme
stochastic agent (acme/jax/stochastic_muzero/acting.py:80-130). Each policy is
a pure function over the generic batched ``search()`` core, so custom
policies (like the reference's diffusion_muzero/policy.py) can be composed
the same way.
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import flax.struct as struct
import jax
import jax.numpy as jnp

from muax_tpu.search import action_selection as selection_lib
from muax_tpu.search import qtransforms
from muax_tpu.search import seq_halving
from muax_tpu.search.core import search
from muax_tpu.search.tree import ROOT_INDEX, Tree
from muax_tpu.search.types import (
    ChanceRecurrentFn,
    DecisionRecurrentFn,
    PolicyOutput,
    RecurrentFn,
    RecurrentFnOutput,
    RootFnOutput,
    StochasticRecurrentState,
)

_BIG_NEG = -1e9


def _get_logits_from_probs(probs: jax.Array) -> jax.Array:
  tiny = jnp.finfo(probs.dtype).tiny
  return jnp.log(jnp.maximum(probs, tiny))


def _apply_temperature(logits: jax.Array, temperature) -> jax.Array:
  """temperature -> 0 degrades gracefully to argmax."""
  logits = logits - jnp.max(logits, keepdims=True, axis=-1)
  tiny = jnp.finfo(logits.dtype).tiny
  return logits / jnp.maximum(tiny, temperature)


def _mask_invalid(logits: jax.Array, invalid: Optional[jax.Array]):
  if invalid is None:
    return logits
  return jnp.where(invalid > 0, _BIG_NEG, logits)


def _add_dirichlet_noise(rng, probs, *, fraction, alpha):
  batch_size, num_actions = probs.shape
  noise = jax.random.dirichlet(
      rng, jnp.full(num_actions, alpha), shape=(batch_size,))
  return (1.0 - fraction) * probs + fraction * noise


def muzero_policy(
    params: Any,
    rng: jax.Array,
    root: RootFnOutput,
    recurrent_fn: RecurrentFn,
    num_simulations: int,
    invalid_actions: Optional[jax.Array] = None,
    max_depth: Optional[int] = None,
    *,
    qtransform=qtransforms.qtransform_by_parent_and_siblings,
    dirichlet_fraction: float = 0.25,
    dirichlet_alpha: float = 0.3,
    pb_c_init: float = 1.25,
    pb_c_base: float = 19652.0,
    temperature: float | jax.Array = 1.0,
) -> PolicyOutput[Tree]:
  """Vanilla MuZero: dirichlet-noised PUCT search, visit-count^{1/T} action.

  Defaults match the reference's MuZeroPolicy (muax/policy.py:13-30).
  """
  rng, noise_rng, search_rng, sample_rng = jax.random.split(rng, 4)
  probs = jax.nn.softmax(root.prior_logits, axis=-1)
  probs = _add_dirichlet_noise(noise_rng, probs, fraction=dirichlet_fraction,
                               alpha=dirichlet_alpha)
  noised_logits = _get_logits_from_probs(probs)
  root = root.replace(
      prior_logits=_mask_invalid(noised_logits, invalid_actions))

  select_fn = selection_lib.make_muzero_action_selection(
      pb_c_init=pb_c_init, pb_c_base=pb_c_base, qtransform=qtransform)
  tree = search(
      params, search_rng, root=root, recurrent_fn=recurrent_fn,
      root_action_selection_fn=select_fn,
      interior_action_selection_fn=select_fn,
      num_simulations=num_simulations, max_depth=max_depth,
      invalid_actions=invalid_actions)

  summary = tree.summary()
  action_weights = summary.visit_probs
  action_logits = _apply_temperature(
      _get_logits_from_probs(action_weights), temperature)
  action = jax.random.categorical(sample_rng, action_logits)
  return PolicyOutput(action=action.astype(jnp.int32),
                      action_weights=action_weights, search_tree=tree)


@struct.dataclass
class GumbelExtraData:
  root_gumbel: jax.Array  # [B, A]


def gumbel_muzero_policy(
    params: Any,
    rng: jax.Array,
    root: RootFnOutput,
    recurrent_fn: RecurrentFn,
    num_simulations: int,
    invalid_actions: Optional[jax.Array] = None,
    max_depth: Optional[int] = None,
    *,
    qtransform=qtransforms.qtransform_completed_by_mix_value,
    max_num_considered_actions: int = 16,
    gumbel_scale: float = 1.0,
) -> PolicyOutput[Tree]:
  """Gumbel MuZero: sequential-halving root search, policy-improvement
  weights softmax(logits + sigma(q-hat)).

  Defaults match the reference's GumbelMuZeroPolicy (muax/policy.py:33-47).
  """
  rng, gumbel_rng, search_rng = jax.random.split(rng, 3)
  root = root.replace(
      prior_logits=_mask_invalid(root.prior_logits, invalid_actions))
  gumbel = gumbel_scale * jax.random.gumbel(
      gumbel_rng, root.prior_logits.shape, root.prior_logits.dtype)
  extra = GumbelExtraData(root_gumbel=gumbel)

  table = jnp.asarray(seq_halving.considered_visit_table(
      max_num_considered_actions, num_simulations))
  root_fn = functools.partial(
      selection_lib.gumbel_muzero_root_action_selection,
      table=table, max_num_considered_actions=max_num_considered_actions,
      qtransform=qtransform)
  interior_fn = functools.partial(
      selection_lib.gumbel_muzero_interior_action_selection,
      qtransform=qtransform)

  tree = search(
      params, search_rng, root=root, recurrent_fn=recurrent_fn,
      root_action_selection_fn=root_fn,
      interior_action_selection_fn=interior_fn,
      num_simulations=num_simulations, max_depth=max_depth,
      invalid_actions=invalid_actions, extra_data=extra)

  # Final action: among actions at the most-advanced schedule stage (max
  # visit count), argmax of g + logits + sigma(q-hat).
  summary = tree.summary()
  batch_size = root.prior_logits.shape[0]
  completed_q = qtransform(tree,
                           jnp.full((batch_size,), ROOT_INDEX, jnp.int32))
  considered_visit = jnp.max(summary.visit_counts, axis=-1, keepdims=True)
  score = jnp.where(summary.visit_counts == considered_visit,
                    gumbel + root.prior_logits + completed_q, -jnp.inf)
  score = _mask_invalid(score, invalid_actions)
  action = jnp.argmax(score, axis=-1).astype(jnp.int32)

  action_weights = jax.nn.softmax(
      _mask_invalid(root.prior_logits + completed_q, invalid_actions), -1)
  return PolicyOutput(action=action, action_weights=action_weights,
                      search_tree=tree)


def _make_stochastic_recurrent_fn(
    decision_recurrent_fn: DecisionRecurrentFn,
    chance_recurrent_fn: ChanceRecurrentFn,
    num_actions: int,
    num_chance_outcomes: int,
    discount,
) -> RecurrentFn:
  """Interleave decision and chance steps over A' = A + C extended actions.

  Both branches are evaluated and blended by ``is_decision_node`` — under
  ``vmap``/batching this is cheaper and simpler than a batched cond, and the
  two nets are small (SURVEY §2d).
  """

  def fn(params, rng, action, state: StochasticRecurrentState):
    a = jnp.clip(action, 0, num_actions - 1)
    outcome = jnp.clip(action - num_actions, 0, num_chance_outcomes - 1)
    dec_out, afterstate = decision_recurrent_fn(params, rng, a, state.state)
    ch_out, next_state = chance_recurrent_fn(params, rng, outcome,
                                             state.state)
    is_dec = state.is_decision_node

    # New node after a decision action is an afterstate (chance node): its
    # children are chance outcomes. After a chance outcome it is a state
    # (decision node): its children are decisions.
    batch = is_dec.shape[0]
    pad_a = jnp.full((batch, num_actions), _BIG_NEG,
                     dec_out.chance_logits.dtype)
    pad_c = jnp.full((batch, num_chance_outcomes), _BIG_NEG,
                     ch_out.action_logits.dtype)
    afterstate_priors = jnp.concatenate([pad_a, dec_out.chance_logits], -1)
    state_priors = jnp.concatenate([ch_out.action_logits, pad_c], -1)

    output = RecurrentFnOutput(
        reward=jnp.where(is_dec, 0.0, ch_out.reward),
        discount=jnp.where(is_dec, 1.0,
                           jnp.broadcast_to(discount, is_dec.shape)),
        prior_logits=jnp.where(is_dec[:, None], afterstate_priors,
                               state_priors),
        value=jnp.where(is_dec, dec_out.afterstate_value, ch_out.value),
    )
    new_embedding = StochasticRecurrentState(
        state=jax.tree.map(
            lambda a_, s_: jnp.where(
                is_dec.reshape((-1,) + (1,) * (a_.ndim - 1)), a_, s_),
            afterstate, next_state),
        is_decision_node=jnp.logical_not(is_dec),
    )
    return output, new_embedding

  return fn


def _stochastic_interior_selection(rng, tree, node_index, depth, sim, *,
                                   num_actions, pb_c_init, pb_c_base,
                                   qtransform):
  """Decision nodes: PUCT over decision slots. Chance nodes: visit
  proportions track the chance prior (argmax p(o) - n(o)/(1+N)).

  Batch-native: node_index is [B]; returns [B] slots."""
  from muax_tpu.search.tree import batch_gather
  num_total = tree.num_actions
  is_dec = batch_gather(tree.embeddings.is_decision_node,
                        node_index)                               # [B]
  slot = jnp.arange(num_total)
  valid_slots = jnp.where(is_dec[:, None], slot[None] < num_actions,
                          slot[None] >= num_actions)              # [B, A']

  visit_counts = batch_gather(tree.children_visits,
                              node_index).astype(jnp.float32)
  node_visit = batch_gather(tree.node_visits,
                            node_index).astype(jnp.float32)       # [B]
  pb_c = pb_c_init + jnp.log((node_visit + pb_c_base + 1.0) / pb_c_base)
  prior_probs = jax.nn.softmax(
      batch_gather(tree.children_prior_logits, node_index), -1)
  policy_score = (jnp.sqrt(node_visit) * pb_c)[:, None] * prior_probs / (
      visit_counts + 1.0)
  value_score = qtransform(tree, node_index)
  noise = jax.random.uniform(rng, policy_score.shape) * 1e-7
  decision_score = value_score + policy_score + noise

  chance_score = prior_probs - visit_counts / (
      1.0 + jnp.sum(visit_counts, axis=-1, keepdims=True))

  score = jnp.where(is_dec[:, None], decision_score, chance_score)
  score = jnp.where(valid_slots, score, -jnp.inf)
  score = jnp.where(depth == 0,
                    jnp.where(tree.root_invalid_actions > 0, -jnp.inf, score),
                    score)
  return jnp.argmax(score, axis=-1).astype(jnp.int32)


def stochastic_muzero_policy(
    params: Any,
    rng: jax.Array,
    root: RootFnOutput,
    decision_recurrent_fn: DecisionRecurrentFn,
    chance_recurrent_fn: ChanceRecurrentFn,
    num_simulations: int,
    num_chance_outcomes: int,
    invalid_actions: Optional[jax.Array] = None,
    max_depth: Optional[int] = None,
    *,
    qtransform=qtransforms.qtransform_by_parent_and_siblings,
    dirichlet_fraction: float = 0.25,
    dirichlet_alpha: float = 0.3,
    pb_c_init: float = 1.25,
    pb_c_base: float = 19652.0,
    temperature: float | jax.Array = 1.0,
    discount: float | jax.Array = 1.0,
) -> PolicyOutput[Tree]:
  """Stochastic MuZero over the extended action space A' = A + C.

  Decision and chance steps interleave down the tree; rewards and the
  environment discount apply on chance transitions. Parity target:
  mctx.stochastic_muzero_policy as used by the reference
  (acme/jax/stochastic_muzero/acting.py:110-130).
  """
  batch_size, num_actions = root.prior_logits.shape
  rng, noise_rng, search_rng, sample_rng = jax.random.split(rng, 4)

  probs = jax.nn.softmax(root.prior_logits, axis=-1)
  probs = _add_dirichlet_noise(noise_rng, probs, fraction=dirichlet_fraction,
                               alpha=dirichlet_alpha)
  noised_logits = _get_logits_from_probs(probs)
  noised_logits = _mask_invalid(noised_logits, invalid_actions)

  pad_c = jnp.full((batch_size, num_chance_outcomes), _BIG_NEG,
                   root.prior_logits.dtype)
  extended_root = RootFnOutput(
      prior_logits=jnp.concatenate([noised_logits, pad_c], -1),
      value=root.value,
      embedding=StochasticRecurrentState(
          state=root.embedding,
          is_decision_node=jnp.ones((batch_size,), jnp.bool_)),
  )
  # Chance slots are never valid at the (decision) root.
  if invalid_actions is None:
    invalid_actions = jnp.zeros((batch_size, num_actions),
                                root.prior_logits.dtype)
  extended_invalid = jnp.concatenate(
      [invalid_actions,
       jnp.ones((batch_size, num_chance_outcomes), invalid_actions.dtype)],
      -1)

  combined_fn = _make_stochastic_recurrent_fn(
      decision_recurrent_fn, chance_recurrent_fn, num_actions,
      num_chance_outcomes, discount)
  select_fn = functools.partial(
      _stochastic_interior_selection, num_actions=num_actions,
      pb_c_init=pb_c_init, pb_c_base=pb_c_base, qtransform=qtransform)

  tree = search(
      params, search_rng, root=extended_root, recurrent_fn=combined_fn,
      root_action_selection_fn=select_fn,
      interior_action_selection_fn=select_fn,
      num_simulations=num_simulations, max_depth=max_depth,
      invalid_actions=extended_invalid, extra_data=())

  summary = tree.summary()
  decision_probs = summary.visit_probs[:, :num_actions]
  decision_probs = decision_probs / jnp.maximum(
      jnp.sum(decision_probs, -1, keepdims=True), 1e-12)
  action_logits = _apply_temperature(
      _get_logits_from_probs(decision_probs), temperature)
  action = jax.random.categorical(sample_rng, action_logits)
  return PolicyOutput(action=action.astype(jnp.int32),
                      action_weights=decision_probs, search_tree=tree)
