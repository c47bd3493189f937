"""Diffusion MuZero k-step unrolled loss: flow matching as the chance model.

The learner delta the reference intended but never wired: its diffusion
learner is the SMZ unroll with the chance net consuming the continuous code
(acme/jax/diffusion_muzero/learning.py:229) while ``flow_matching``/the SDE
library sit unused. Here the velocity field is trained *inside* the unroll:

per step i (L-1 chance transitions over an L window):
  * policy CE + value CE at s_i (prediction net, as MuZero/SMZ),
  * decision(s_i, a_i) -> (afterstate, av_logits); afterstate-value CE vs the
    same step's return target (the SMZ convention, stochastic_losses.py),
  * flow matching: regress v(x_t, t | afterstate) onto the straight-path
    velocity toward x0 = sg(repr(obs_{i+1})) — the true next latent is the
    "chance outcome" (continuous, no codebook),
  * reward CE on the readout of the true next latent,
  * the unroll continues through the learned dynamics via the flow's
    conditional-mean readout v(0, 0 | afterstate) (diffusion_networks.
    mean_next_state) with scale_gradient 0.5 — so dynamics gradients flow
    across steps exactly like the SMZ chance-net unroll.

Loss is /L-normalized + L2, and priorities are |v - Rn|^alpha at the root
step — identical conventions to losses.muzero_loss.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from muax_tpu.models.diffusion import batch_mul
from muax_tpu.models.diffusion_networks import DMZNetworks, DMZParams
from muax_tpu.ops import scalar_to_support, scale_gradient, support_to_scalar
from muax_tpu.types import Transition


class DMZLossMetrics(NamedTuple):
  total: jax.Array
  reward_loss: jax.Array
  value_loss: jax.Array
  policy_loss: jax.Array
  afterstate_value_loss: jax.Array
  flow_loss: jax.Array
  l2_loss: jax.Array
  priorities: jax.Array


def _ce(logits, target_probs):
  target_probs = jax.lax.stop_gradient(target_probs)
  return -jnp.sum(target_probs * jax.nn.log_softmax(logits, -1), axis=-1)


def diffusion_muzero_loss(
    params: DMZParams,
    batch: Transition,
    networks: DMZNetworks,
    rng: jax.Array,
    *,
    num_unroll_steps: int | None = None,
    l2_coef: float = 1e-4,
    gradient_scale: float = 0.5,
    flow_coef: float = 1.0,
    priority_alpha: float = 0.5,
) -> tuple[jax.Array, DMZLossMetrics]:
  """Unrolled diffusion-MuZero loss on a [B, L, ...] batch. RNG draws the
  flow-matching (t, eps) pairs — one fresh pair per unroll step."""
  support = networks.support_size
  flow = networks.flow
  L = num_unroll_steps or batch.action.shape[1]
  B = batch.action.shape[0]

  s = networks.representation.apply(params.representation, batch.obs[:, 0])

  reward_loss = jnp.zeros(B)
  value_loss = jnp.zeros(B)
  policy_loss = jnp.zeros(B)
  av_loss = jnp.zeros(B)
  flow_loss = jnp.zeros(B)
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
      break  # no next observation to supervise the transition with

    next_mask = batch.mask[:, i + 1].astype(s.dtype)
    z_next = jax.lax.stop_gradient(
        networks.representation.apply(params.representation,
                                      batch.obs[:, i + 1]))

    s = scale_gradient(s, gradient_scale)
    afterstate, av_logits = networks.decision.apply(
        params.decision, s, batch.action[:, i])
    av_loss += next_mask * _ce(av_logits,
                               scalar_to_support(batch.rn[:, i], support))

    # Flow matching toward the true next latent, conditioned on the
    # afterstate (models/diffusion.flow_matching_loss, per-example form so
    # the segment mask applies).
    rng, t_rng, eps_rng = jax.random.split(rng, 3)
    t = jax.random.uniform(t_rng, (B,), s.dtype)
    eps = jax.random.normal(eps_rng, z_next.shape, s.dtype)
    mean, std = flow.marginal_prob(z_next, t)
    x_t = mean + batch_mul(std, eps)
    target = z_next - flow.sigma * eps
    pred_v = networks.velocity.apply(params.velocity, x_t, t, afterstate)
    flow_loss += next_mask * jnp.mean(jnp.square(pred_v - target), axis=-1)

    # Reward readout of the realized transition.
    reward_logits = networks.reward.apply(params.reward, z_next)
    reward_loss += next_mask * _ce(
        reward_logits, scalar_to_support(batch.reward[:, i], support))

    # Continue the unroll through the learned dynamics (conditional mean).
    s = scale_gradient(networks.mean_next_state(params, afterstate),
                       gradient_scale)

  denom = jnp.maximum(jnp.sum(batch.mask, axis=1), 1.0)
  per_example = (reward_loss + value_loss + policy_loss + av_loss
                 + flow_coef * flow_loss) / denom
  weighted = jnp.mean(batch.weight * per_example)
  l2 = l2_coef * 0.5 * sum(
      jnp.sum(jnp.square(p))
      for p in jax.tree.leaves((params.representation, params.prediction,
                                params.decision, params.velocity,
                                params.reward)))
  total = weighted + l2
  priorities = jnp.abs(first_value - batch.rn[:, 0]) ** priority_alpha
  metrics = DMZLossMetrics(
      total=total,
      reward_loss=jnp.mean(reward_loss / denom),
      value_loss=jnp.mean(value_loss / denom),
      policy_loss=jnp.mean(policy_loss / denom),
      afterstate_value_loss=jnp.mean(av_loss / denom),
      flow_loss=jnp.mean(flow_loss / denom),
      l2_loss=l2,
      priorities=jax.lax.stop_gradient(priorities),
  )
  return total, metrics
