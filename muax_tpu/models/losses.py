"""The k-step unrolled MuZero loss.

Semantics parity with the reference's ``default_loss_fn`` (muax/loss.py:10-88)
and the acme learner loss (acme/jax/muzero/learning.py:176-256):
  * value/reward targets as categorical cross-entropy against two-hot
    supports of h-transformed scalars,
  * policy cross-entropy against search visit distributions,
  * hidden-state gradient scaled by 0.5 through the dynamics unroll,
  * stop-gradient on all targets, loss normalized by the unroll length
    (the coax twin's ``/L`` at frameworks/coax/model.py:418-419), and
  * L2 regularization 1e-4 * 0.5 * sum(p^2).

Additions for the on-device pipeline: per-step validity masks (episode
boundaries inside fixed-length segments) and fresh PER priorities returned
alongside the loss (replaces the reference's async Reverb priority mutation,
learning.py:108-121).

The unroll is a static Python loop (L is small: 5-10) so XLA fuses the whole
chain into one program with the batched matmuls on the MXU.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from muax_tpu.models.networks import MZNetworks, MZParams
from muax_tpu.ops import (
    scalar_to_support,
    scalar_to_two_hot,
    scale_gradient,
    support_to_scalar,
    two_hot_to_scalar,
)
from muax_tpu.types import Transition


def _target_codec(networks):
  """(scalar -> probs, probs -> scalar) for either value-head convention."""
  if hasattr(networks, "num_bins"):
    enc = lambda x: scalar_to_two_hot(x, networks.num_bins, networks.vmin,
                                      networks.vmax)
    dec = lambda p: two_hot_to_scalar(p, networks.vmin, networks.vmax)
  else:
    enc = lambda x: scalar_to_support(x, networks.support_size)
    dec = lambda p: support_to_scalar(p, networks.support_size)
  return enc, dec


class LossMetrics(NamedTuple):
  total: jax.Array
  reward_loss: jax.Array
  value_loss: jax.Array
  policy_loss: jax.Array
  l2_loss: jax.Array
  priorities: jax.Array  # [B] fresh PER priorities


def _ce(logits: jax.Array, target_probs: jax.Array) -> jax.Array:
  """Per-example softmax cross-entropy; targets are stop-gradiented."""
  target_probs = jax.lax.stop_gradient(target_probs)
  return -jnp.sum(target_probs * jax.nn.log_softmax(logits, -1), axis=-1)


def muzero_loss(
    params: MZParams,
    batch: Transition,
    networks: MZNetworks,
    *,
    num_unroll_steps: int | None = None,
    l2_coef: float = 1e-4,
    gradient_scale: float = 0.5,
    priority_alpha: float = 0.5,
    dynamics_on_first_embedding: bool = True,
    compute_dtype=None,
    remat: bool = False,
    batched_prediction: bool = True,
) -> tuple[jax.Array, LossMetrics]:
  """Compute the unrolled loss on a [B, L, ...] batch.

  ``dynamics_on_first_embedding`` keeps the top-level reference semantics
  (model.py:265-282: prediction runs on the *post*-transition embedding).

  ``compute_dtype=jnp.bfloat16`` runs the network applies in bf16 (params
  cast in-graph, so jax.grad still yields f32 master-weight grads — the
  standard AMP recipe); the cross-entropies, target encodes, and L2 stay
  f32. ``remat=True`` wraps the per-step applies in ``jax.checkpoint`` so
  the backward pass recomputes activations instead of round-tripping them
  through HBM — both knobs exist because the conv-family gradient step is
  HBM-bandwidth-bound, not MXU-bound (scripts/conv_flops_analysis.py:
  22.7 GF but ~1.1 GB accessed per update).
  """
  encode, decode = _target_codec(networks)
  num_steps = num_unroll_steps or batch.action.shape[1]
  batch_size = batch.action.shape[0]

  if compute_dtype is not None:
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(compute_dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
  else:
    cast = lambda t: t
  repr_apply = networks.representation.apply
  pred_apply = networks.prediction.apply
  dyn_apply = networks.dynamic.apply
  if remat:
    repr_apply = jax.checkpoint(repr_apply)
    dyn_apply = jax.checkpoint(dyn_apply)
  repr_params = cast(params.representation)
  pred_params = cast(params.prediction)
  dyn_params = cast(params.dynamic)

  obs0 = batch.obs[:, 0]
  if compute_dtype is not None and jnp.issubdtype(obs0.dtype, jnp.floating):
    obs0 = obs0.astype(compute_dtype)
  s = repr_apply(repr_params, obs0)

  reward_loss = jnp.zeros(batch_size)
  value_loss = jnp.zeros(batch_size)
  policy_loss = jnp.zeros(batch_size)
  first_value = None

  # Encode ALL two-hot targets once over [B, L] (targets are
  # stop-gradiented constants; one vectorized encode instead of 2L
  # per-step encodes keeps the op count of the unrolled graph down).
  value_targets = encode(batch.rn[:, :num_steps])
  reward_targets = encode(batch.reward[:, :num_steps])

  if batched_prediction:
    # Exact-math op-count reduction: the prediction tower never feeds the
    # dynamics chain, so run the chain first, stack the K per-step latents,
    # and apply prediction ONCE on a [K*B] batch. Identical gradients
    # (test-pinned); K x fewer prediction ops — the conv-family learner is
    # per-op-overhead bound (scripts/conv_scaling_probe_out.json: ms/update
    # flat from batch 32 to 128 over ~1400 compiled ops).
    step_states = [s]
    for i in range(num_steps):
      s = scale_gradient(s, gradient_scale)
      reward_logits, s = dyn_apply(dyn_params, s, batch.action[:, i])
      reward_loss += batch.mask[:, i].astype(jnp.float32) * _ce(
          reward_logits.astype(jnp.float32), reward_targets[:, i])
      if i < num_steps - 1:
        step_states.append(s)
    stacked = jnp.concatenate(step_states, axis=0)       # [K*B, ...]
    policy_logits, value_logits = pred_apply(pred_params, stacked)
    policy_logits = policy_logits.astype(jnp.float32).reshape(
        (num_steps, batch_size, -1))
    value_logits = value_logits.astype(jnp.float32).reshape(
        (num_steps, batch_size, -1))
    mask_t = batch.mask.astype(jnp.float32)
    for i in range(num_steps):
      value_loss += mask_t[:, i] * _ce(value_logits[i], value_targets[:, i])
      policy_loss += mask_t[:, i] * _ce(policy_logits[i], batch.pi[:, i])
    first_value = decode(jax.nn.softmax(value_logits[0], -1))
  else:
    for i in range(num_steps):
      mask = batch.mask[:, i].astype(jnp.float32)
      policy_logits, value_logits = pred_apply(pred_params, s)
      policy_logits = policy_logits.astype(jnp.float32)
      value_logits = value_logits.astype(jnp.float32)
      value_loss += mask * _ce(value_logits, value_targets[:, i])
      policy_loss += mask * _ce(policy_logits, batch.pi[:, i])
      if i == 0:
        first_value = decode(jax.nn.softmax(value_logits, -1))

      s = scale_gradient(s, gradient_scale)
      reward_logits, s = dyn_apply(dyn_params, s, batch.action[:, i])
      reward_loss += mask * _ce(reward_logits.astype(jnp.float32),
                                reward_targets[:, i])

  denom = jnp.maximum(jnp.sum(batch.mask, axis=1), 1.0)
  reward_loss = reward_loss / denom
  value_loss = value_loss / denom
  policy_loss = policy_loss / denom

  per_example = reward_loss + value_loss + policy_loss
  weighted = jnp.mean(batch.weight * per_example)

  l2 = l2_coef * 0.5 * sum(
      jnp.sum(jnp.square(p))
      for p in jax.tree.leaves((params.representation, params.prediction,
                                params.dynamic)))
  total = weighted + l2

  priorities = jnp.abs(first_value - batch.rn[:, 0]) ** priority_alpha
  metrics = LossMetrics(
      total=total,
      reward_loss=jnp.mean(reward_loss),
      value_loss=jnp.mean(value_loss),
      policy_loss=jnp.mean(policy_loss),
      l2_loss=l2,
      priorities=jax.lax.stop_gradient(priorities),
  )
  return total, metrics
