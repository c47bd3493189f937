"""Sampled MuZero: batched search over sampled continuous / factored actions.

Capability parity with the reference's sampled-MCTS family — the
``SampledMCTSActor`` (acme/tf/mcts/acting.py:253-378), ``sampled_mcts`` and
``factored_puct`` (acme/tf/mcts/search.py:688-734), and the ``SampledNode``/
``SubNode`` factored trees — re-designed for the array-tree engine: instead
of per-dimension Python sub-nodes, each node holds K jointly-sampled
candidate actions and the tree searches the K slots with PUCT, exactly like
the chance slots of the stochastic/diffusion policies. The continuous action
is recovered by gathering the chosen slot's candidate.

Interfaces (all batched on B):
  sample_fn(params, rng, state) -> (actions [B, K, ...], log_probs [B, K])
      Draw K candidate actions from the proposal (policy prior) at a state.
      log_probs may be ``None`` for a uniform empirical prior — with K iid
      samples from the prior, uniform slot priors already implement the
      prior weighting (duplicates get proportional mass), which is the
      Sampled MuZero empirical-prior recipe; the reference's
      ``empirical / q * p`` correction (acting.py:305-311) corresponds to
      passing the proposal log-probs.
  recurrent_fn(params, rng, action_values [B, ...], state)
      -> (ContinuousRecurrentFnOutput, next_state)
      One dynamics + evaluation step on actual continuous action values.

For per-dimension binned (factored) action spaces, compose
``make_factored_bin_sample_fn`` — it reproduces the reference's
``_sample_per_dimension`` + bin<->value mapping (acting.py:313-345) as one
vectorized categorical draw per dimension.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import flax.struct as struct
import jax
import jax.numpy as jnp

from muax_tpu.search import action_selection as selection_lib
from muax_tpu.search import qtransforms
from muax_tpu.search.core import search
from muax_tpu.search.policies import (
    _add_dirichlet_noise,
    _apply_temperature,
    _get_logits_from_probs,
)
from muax_tpu.search.tree import Tree
from muax_tpu.search.types import (
    RecurrentFnOutput,
    RootFnOutput,
)


@struct.dataclass
class ContinuousRecurrentFnOutput:
  """One dynamics step on a continuous action — no prior logits; slot
  priors come from ``sample_fn``."""
  reward: jax.Array    # [B]
  discount: jax.Array  # [B]
  value: jax.Array     # [B]


@struct.dataclass
class SampledRecurrentState:
  """Tree embedding: latent state + this node's K candidate actions."""
  state: Any              # [B, ...]
  candidate_actions: Any  # [B, K, ...]


@struct.dataclass
class SampledPolicyOutput:
  """Continuous-action policy output: slot stats plus gathered actions."""
  action: Any                # [B, ...] continuous action of the chosen slot
  action_slot: jax.Array     # [B] index into the K root candidates
  action_weights: jax.Array  # [B, K] visit distribution over the slots
  sampled_actions: Any       # [B, K, ...] root candidate set
  search_tree: Tree


def _slot_priors(log_probs: Optional[jax.Array], batch: int, num_samples: int,
                 dtype) -> jax.Array:
  if log_probs is None:
    return jnp.zeros((batch, num_samples), dtype)
  return jax.nn.log_softmax(log_probs, axis=-1).astype(dtype)


def sampled_muzero_policy(
    params: Any,
    rng: jax.Array,
    root: RootFnOutput,
    sample_fn: Callable,
    recurrent_fn: Callable,
    num_simulations: int,
    num_samples: int,
    max_depth: Optional[int] = None,
    *,
    qtransform=qtransforms.qtransform_by_parent_and_siblings,
    dirichlet_fraction: float = 0.25,
    dirichlet_alpha: float = 0.3,
    pb_c_init: float = 1.25,
    pb_c_base: float = 19652.0,
    temperature: float | jax.Array = 1.0,
) -> SampledPolicyOutput:
  """PUCT search over K sampled candidate actions per node.

  ``root.prior_logits`` is ignored (slot priors come from ``sample_fn``);
  pass any [B, *] array. Candidates are resampled at every expanded node —
  the progressive-widening-free Sampled MuZero scheme, which replaces the
  reference's root-only per-dimension binning with fresh proposals down the
  whole tree.
  """
  batch_size = root.value.shape[0]
  dtype = root.value.dtype
  (rng, root_sample_rng, noise_rng, search_rng,
   action_rng) = jax.random.split(rng, 5)

  root_actions, root_logp = sample_fn(params, root_sample_rng, root.embedding)
  root_priors = _slot_priors(root_logp, batch_size, num_samples, dtype)
  probs = jax.nn.softmax(root_priors, -1)
  probs = _add_dirichlet_noise(noise_rng, probs, fraction=dirichlet_fraction,
                               alpha=dirichlet_alpha)

  extended_root = RootFnOutput(
      prior_logits=_get_logits_from_probs(probs),
      value=root.value,
      embedding=SampledRecurrentState(state=root.embedding,
                                      candidate_actions=root_actions),
  )

  def slot_recurrent_fn(params_, rng_, slot, emb: SampledRecurrentState):
    step_rng, resample_rng = jax.random.split(rng_)
    chosen = jax.tree.map(
        lambda c: jnp.take_along_axis(
            c, slot.reshape((batch_size, 1) + (1,) * (c.ndim - 2)),
            axis=1).squeeze(1),
        emb.candidate_actions)
    out, next_state = recurrent_fn(params_, step_rng, chosen, emb.state)
    next_actions, next_logp = sample_fn(params_, resample_rng, next_state)
    output = RecurrentFnOutput(
        reward=out.reward,
        discount=out.discount,
        prior_logits=_slot_priors(next_logp, batch_size, num_samples, dtype),
        value=out.value,
    )
    return output, SampledRecurrentState(state=next_state,
                                         candidate_actions=next_actions)

  select_fn = selection_lib.make_muzero_action_selection(
      pb_c_init=pb_c_init, pb_c_base=pb_c_base, qtransform=qtransform)
  tree = search(
      params, search_rng, root=extended_root, recurrent_fn=slot_recurrent_fn,
      root_action_selection_fn=select_fn,
      interior_action_selection_fn=select_fn,
      num_simulations=num_simulations, max_depth=max_depth)

  summary = tree.summary()
  action_weights = summary.visit_probs
  slot_logits = _apply_temperature(
      _get_logits_from_probs(action_weights), temperature)
  slot = jax.random.categorical(action_rng, slot_logits).astype(jnp.int32)
  action = jax.tree.map(
      lambda c: jnp.take_along_axis(
          c, slot.reshape((batch_size, 1) + (1,) * (c.ndim - 2)),
          axis=1).squeeze(1),
      root_actions)
  return SampledPolicyOutput(action=action, action_slot=slot,
                             action_weights=action_weights,
                             sampled_actions=root_actions, search_tree=tree)


def make_factored_bin_sample_fn(
    dim_logits_fn: Callable,
    low: jax.Array,
    high: jax.Array,
    num_bins: int,
    num_samples: int,
) -> Callable:
  """Per-dimension binned proposal (the reference's factored scheme).

  ``dim_logits_fn(params, state) -> [B, D, num_bins]`` scores bins per action
  dimension; each candidate draws one bin per dimension independently and
  maps it to the bin center ``low + (bin + 0.5) * (high - low) / num_bins``
  (reference bin<->value mapping, acme/tf/mcts/acting.py:329-345). Returns a
  ``sample_fn`` producing (actions [B, K, D], log_probs [B, K] = sum over
  dimensions of the chosen bins' log-probabilities — the factored empirical
  prior the reference's ``factored_puct`` scores with).
  """
  low = jnp.asarray(low, jnp.float32)
  high = jnp.asarray(high, jnp.float32)

  def sample_fn(params, rng, state):
    logits = dim_logits_fn(params, state)               # [B, D, bins]
    batch, dims, _ = logits.shape
    bins = jax.random.categorical(
        rng, logits[:, None], axis=-1,
        shape=(batch, num_samples, dims))               # [B, K, D]
    log_probs_all = jax.nn.log_softmax(logits, -1)      # [B, D, bins]
    picked = jnp.take_along_axis(
        log_probs_all[:, None].repeat(num_samples, 1),  # [B, K, D, bins]
        bins[..., None], axis=-1).squeeze(-1)           # [B, K, D]
    log_probs = jnp.sum(picked, axis=-1)                # [B, K]
    width = (high - low) / num_bins
    actions = low + (bins.astype(jnp.float32) + 0.5) * width
    return actions, log_probs

  return sample_fn


def make_gaussian_sample_fn(
    gaussian_params_fn: Callable,
    num_samples: int,
    low: Optional[jax.Array] = None,
    high: Optional[jax.Array] = None,
) -> Callable:
  """Diagonal-Gaussian proposal for continuous control.

  ``gaussian_params_fn(params, state) -> (mu [B, D], log_std [B, D])``; K
  candidates are drawn iid and (optionally) clipped to [low, high]. Returns
  log-probs of the *unclipped* draws — with iid proposal sampling the
  uniform empirical prior is also fine (pass ``use_log_probs=False`` by
  ignoring them in the caller).
  """

  def sample_fn(params, rng, state):
    mu, log_std = gaussian_params_fn(params, state)
    std = jnp.exp(log_std)
    eps = jax.random.normal(rng, (mu.shape[0], num_samples) + mu.shape[1:],
                            mu.dtype)
    actions = mu[:, None] + std[:, None] * eps
    log_probs = jnp.sum(
        -0.5 * jnp.square(eps) - log_std[:, None]
        - 0.5 * jnp.log(2 * jnp.pi), axis=-1)
    if low is not None or high is not None:
      actions = jnp.clip(actions, low, high)
    return actions, log_probs

  return sample_fn
