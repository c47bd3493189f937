"""Root/recurrent inference closures bridging networks into the search.

Semantics parity: ``_root_inference`` (repr -> pred, support -> scalar) and
``_recurrent_inference`` (dyn -> pred on the *next* embedding), reference
muax/model.py:251-282 and acme/jax/muzero/acting.py:58-108.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from muax_tpu.models.networks import MZNetworks, MZParams
from muax_tpu.ops import logits_to_scalar
from muax_tpu.search import RecurrentFnOutput, RootFnOutput


def make_root_fn(networks: MZNetworks):
  """(params, obs [B, ...]) -> RootFnOutput"""

  def root_fn(params: MZParams, obs: jax.Array) -> RootFnOutput:
    embedding = networks.representation.apply(params.representation, obs)
    policy_logits, value_logits = networks.prediction.apply(
        params.prediction, embedding)
    value = logits_to_scalar(value_logits, networks.support_size)
    return RootFnOutput(prior_logits=policy_logits, value=value,
                        embedding=embedding)

  return root_fn


def make_recurrent_fn(networks: MZNetworks, discount: float):
  """Search-facing dynamics step: dyn -> pred on the post-transition state."""

  def recurrent_fn(params: MZParams, rng: jax.Array, action: jax.Array,
                   embedding: jax.Array):
    del rng
    reward_logits, next_embedding = networks.dynamic.apply(
        params.dynamic, embedding, action)
    policy_logits, value_logits = networks.prediction.apply(
        params.prediction, next_embedding)
    reward = logits_to_scalar(reward_logits, networks.support_size)
    value = logits_to_scalar(value_logits, networks.support_size)
    batch = action.shape[0]
    output = RecurrentFnOutput(
        reward=reward,
        discount=jnp.full((batch,), discount, reward.dtype),
        prior_logits=policy_logits,
        value=value,
    )
    return output, next_embedding

  return recurrent_fn
