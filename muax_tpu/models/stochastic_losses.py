"""Stochastic MuZero k-step unrolled loss.

Semantics parity with the reference SMZ learner
(acme/jax/stochastic_muzero/learning.py:221-264): per unroll step,
  * the chance outcome between t and t+1 is encoded from the next
    observation with a straight-through one-hot code,
  * decision step -> (afterstate, chance logits, afterstate value),
  * chance step -> (next state, reward),
  * losses: reward CE, value CE, policy CE, chance-outcome CE
    (chance_logits vs sg(code)), afterstate-value CE (vs the same step's
    value target), and the VQ-VAE commitment beta * mean((enc - sg(code))^2).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from muax_tpu.models.stochastic_networks import (
    SMZNetworks,
    SMZParams,
    straight_through_code,
)
from muax_tpu.ops import scalar_to_support, scale_gradient, support_to_scalar
from muax_tpu.types import Transition


class SMZLossMetrics(NamedTuple):
  total: jax.Array
  reward_loss: jax.Array
  value_loss: jax.Array
  policy_loss: jax.Array
  chance_loss: jax.Array
  afterstate_value_loss: jax.Array
  commitment_loss: jax.Array
  l2_loss: jax.Array
  priorities: jax.Array


def _ce(logits, target_probs):
  target_probs = jax.lax.stop_gradient(target_probs)
  return -jnp.sum(target_probs * jax.nn.log_softmax(logits, -1), axis=-1)


def stochastic_muzero_loss(
    params: SMZParams,
    batch: Transition,
    networks: SMZNetworks,
    *,
    num_unroll_steps: int | None = None,
    l2_coef: float = 1e-4,
    gradient_scale: float = 0.5,
    vqvae_beta: float = 0.25,
    priority_alpha: float = 0.5,
) -> tuple[jax.Array, SMZLossMetrics]:
  """Unrolled SMZ loss on [B, L, ...]. The last unroll step has no next
  observation for the encoder, so the chance chain runs L-1 steps."""
  support = networks.support_size
  L = num_unroll_steps or batch.action.shape[1]
  B = batch.action.shape[0]

  s = networks.representation.apply(params.representation, batch.obs[:, 0])

  reward_loss = jnp.zeros(B)
  value_loss = jnp.zeros(B)
  policy_loss = jnp.zeros(B)
  chance_loss = jnp.zeros(B)
  av_loss = jnp.zeros(B)
  commit_loss = jnp.zeros(B)
  first_value = None

  for i in range(L):
    mask = batch.mask[:, i].astype(s.dtype)
    policy_logits, value_logits = networks.prediction.apply(
        params.prediction, s)
    value_loss += mask * _ce(value_logits,
                             scalar_to_support(batch.rn[:, i], support))
    policy_loss += mask * _ce(policy_logits, batch.pi[:, i])
    if i == 0:
      first_value = support_to_scalar(jax.nn.softmax(value_logits, -1),
                                      support)
    if i == L - 1:
      break  # no next observation to encode the chance outcome from

    next_mask = batch.mask[:, i + 1].astype(s.dtype)
    enc_logits = networks.encoder.apply(params.encoder, batch.obs[:, i + 1])
    code = straight_through_code(enc_logits)

    s = scale_gradient(s, gradient_scale)
    afterstate, chance_logits, av_logits = networks.decision.apply(
        params.decision, s, batch.action[:, i])
    # Afterstate value is supervised toward the same step's return target.
    av_loss += next_mask * _ce(av_logits,
                               scalar_to_support(batch.rn[:, i], support))
    chance_loss += next_mask * _ce(chance_logits,
                                   jax.lax.stop_gradient(code))
    commit_loss += next_mask * jnp.mean(
        jnp.square(jax.nn.softmax(enc_logits, -1)
                   - jax.lax.stop_gradient(code)), axis=-1)

    afterstate = scale_gradient(afterstate, gradient_scale)
    s, reward_logits = networks.chance.apply(params.chance, afterstate, code)
    reward_loss += next_mask * _ce(
        reward_logits, scalar_to_support(batch.reward[:, i], support))

  denom = jnp.maximum(jnp.sum(batch.mask, axis=1), 1.0)
  per_example = (reward_loss + value_loss + policy_loss + chance_loss
                 + av_loss + vqvae_beta * commit_loss) / denom
  weighted = jnp.mean(batch.weight * per_example)
  l2 = l2_coef * 0.5 * sum(
      jnp.sum(jnp.square(p))
      for p in jax.tree.leaves((params.encoder, params.representation,
                                params.prediction, params.decision,
                                params.chance)))
  total = weighted + l2
  priorities = jnp.abs(first_value - batch.rn[:, 0]) ** priority_alpha
  metrics = SMZLossMetrics(
      total=total,
      reward_loss=jnp.mean(reward_loss / denom),
      value_loss=jnp.mean(value_loss / denom),
      policy_loss=jnp.mean(policy_loss / denom),
      chance_loss=jnp.mean(chance_loss / denom),
      afterstate_value_loss=jnp.mean(av_loss / denom),
      commitment_loss=jnp.mean(commit_loss / denom),
      l2_loss=l2,
      priorities=jax.lax.stop_gradient(priorities),
  )
  return total, metrics
