"""Diffusion MuZero: stochastic search over CONTINUOUS next-state samples.

Capability parity with the reference's custom policy
(acme/jax/diffusion_muzero/policy.py:20-213): the chance branch of the
stochastic search draws C candidate next states from a generative sampler
(e.g. a RectifiedFlow ODE, models/diffusion.py) instead of a discrete
codebook; the tree's extended action space is A' = A + C where chance slot i
means "transition into sample i". This module is also the demonstration that
custom policies compose over the generic ``search()`` core — the design
seam the reference built its diffusion agent on.

Interfaces:
  decision_recurrent_fn(params, rng, action, state)
      -> (DecisionRecurrentFnOutput, afterstate)          # as SMZ
  sample_fn(params, rng, afterstate) -> samples [B, C, ...]
  chance_eval_fn(params, rng, next_state)
      -> ChanceRecurrentFnOutput                          # logits/value/reward
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import flax.struct as struct
import jax
import jax.numpy as jnp

from muax_tpu.search import qtransforms
from muax_tpu.search.core import search
from muax_tpu.search.policies import (
    _add_dirichlet_noise,
    _apply_temperature,
    _get_logits_from_probs,
    _mask_invalid,
    _stochastic_interior_selection,
    _BIG_NEG,
)
from muax_tpu.search.tree import Tree
from muax_tpu.search.types import (
    PolicyOutput,
    RecurrentFnOutput,
    RootFnOutput,
)


@struct.dataclass
class DiffusionRecurrentState:
  """Tree embedding (parity: diffusion_muzero/types.py:11-25)."""
  state: Any                     # [B, ...] latent (state or afterstate)
  next_state_samples: Any        # [B, C, ...] candidates at afterstates
  is_decision_node: jax.Array    # [B] bool


def _make_diffusion_recurrent_fn(decision_recurrent_fn, sample_fn,
                                 chance_eval_fn, num_actions: int,
                                 num_samples: int, discount):
  def fn(params, rng, action, emb: DiffusionRecurrentState):
    dec_rng, sample_rng, eval_rng = jax.random.split(rng, 3)
    a = jnp.clip(action, 0, num_actions - 1)
    sample_idx = jnp.clip(action - num_actions, 0, num_samples - 1)
    batch = action.shape[0]

    # Decision branch: state -> afterstate, then draw candidate samples.
    dec_out, afterstate = decision_recurrent_fn(params, dec_rng, a,
                                                emb.state)
    samples = sample_fn(params, sample_rng, afterstate)  # [B, C, ...]

    # Chance branch: commit to the chosen candidate.
    chosen = jax.tree.map(
        lambda s: jnp.take_along_axis(
            s, sample_idx.reshape((batch, 1) + (1,) * (s.ndim - 2)),
            axis=1).squeeze(1),
        emb.next_state_samples)
    ch_out = chance_eval_fn(params, eval_rng, chosen)

    pad_a = jnp.full((batch, num_actions), _BIG_NEG,
                     dec_out.chance_logits.dtype)
    pad_c = jnp.full((batch, num_samples), _BIG_NEG,
                     ch_out.action_logits.dtype)
    afterstate_priors = jnp.concatenate([pad_a, dec_out.chance_logits], -1)
    state_priors = jnp.concatenate([ch_out.action_logits, pad_c], -1)

    is_dec = emb.is_decision_node
    output = RecurrentFnOutput(
        reward=jnp.where(is_dec, 0.0, ch_out.reward),
        discount=jnp.where(is_dec, 1.0,
                           jnp.broadcast_to(discount, is_dec.shape)),
        prior_logits=jnp.where(is_dec[:, None], afterstate_priors,
                               state_priors),
        value=jnp.where(is_dec, dec_out.afterstate_value, ch_out.value),
    )

    def blend(dec_leaf, ch_leaf):
      d = is_dec.reshape((batch,) + (1,) * (dec_leaf.ndim - 1))
      return jnp.where(d, dec_leaf, ch_leaf)

    new_emb = DiffusionRecurrentState(
        state=jax.tree.map(blend, afterstate, chosen),
        next_state_samples=jax.tree.map(blend, samples,
                                        emb.next_state_samples),
        is_decision_node=jnp.logical_not(is_dec),
    )
    return output, new_emb

  return fn


def diffusion_muzero_policy(
    params: Any,
    rng: jax.Array,
    root: RootFnOutput,
    decision_recurrent_fn,
    sample_fn: Callable,
    chance_eval_fn: Callable,
    num_simulations: int,
    num_samples: int,
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
  """Search with diffusion-sampled chance transitions; returns the decision
  -slot visit policy (the reference's `_mask_tree`-to-decision semantics)."""
  batch_size, num_actions = root.prior_logits.shape
  rng, noise_rng, seed_rng, search_rng, sample_rng = jax.random.split(rng, 5)

  probs = jax.nn.softmax(root.prior_logits, -1)
  probs = _add_dirichlet_noise(noise_rng, probs, fraction=dirichlet_fraction,
                               alpha=dirichlet_alpha)
  noised_logits = _get_logits_from_probs(probs)
  noised_logits = _mask_invalid(noised_logits, invalid_actions)

  # Seed the root's candidate set (unused until the first chance step, but
  # fixes the embedding pytree structure).
  seed_samples = sample_fn(params, seed_rng, root.embedding)
  extended_root = RootFnOutput(
      prior_logits=jnp.concatenate(
          [noised_logits,
           jnp.full((batch_size, num_samples), _BIG_NEG,
                    root.prior_logits.dtype)], -1),
      value=root.value,
      embedding=DiffusionRecurrentState(
          state=root.embedding,
          next_state_samples=seed_samples,
          is_decision_node=jnp.ones((batch_size,), jnp.bool_)),
  )
  if invalid_actions is None:
    invalid_actions = jnp.zeros((batch_size, num_actions),
                                root.prior_logits.dtype)
  extended_invalid = jnp.concatenate(
      [invalid_actions,
       jnp.ones((batch_size, num_samples), invalid_actions.dtype)], -1)

  combined = _make_diffusion_recurrent_fn(
      decision_recurrent_fn, sample_fn, chance_eval_fn, num_actions,
      num_samples, discount)
  select_fn = functools.partial(
      _stochastic_interior_selection, num_actions=num_actions,
      pb_c_init=pb_c_init, pb_c_base=pb_c_base, qtransform=qtransform)

  tree = search(
      params, search_rng, root=extended_root, recurrent_fn=combined,
      root_action_selection_fn=select_fn,
      interior_action_selection_fn=select_fn,
      num_simulations=num_simulations, max_depth=max_depth,
      invalid_actions=extended_invalid, extra_data=())

  summary = tree.summary()
  decision_probs = summary.visit_probs[:, :num_actions]
  decision_probs = decision_probs / jnp.maximum(
      jnp.sum(decision_probs, -1, keepdims=True), 1e-12)
  action = jax.random.categorical(
      sample_rng,
      _apply_temperature(_get_logits_from_probs(decision_probs),
                         temperature))
  return PolicyOutput(action=action.astype(jnp.int32),
                      action_weights=decision_probs, search_tree=tree)
