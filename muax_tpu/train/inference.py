"""Root/recurrent inference closures bridging networks into the search.

Semantics parity: ``_root_inference`` (repr -> pred, support -> scalar) and
``_recurrent_inference`` (dyn -> pred on the *next* embedding), reference
muax/model.py:251-282 and acme/jax/muzero/acting.py:58-108.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from muax_tpu.models.networks import MZNetworks, MZParams
from muax_tpu.ops import logits_to_scalar, two_hot_logits_to_scalar
from muax_tpu.search import RecurrentFnOutput, RootFnOutput


def _value_head_decoder(networks):
  """Logits -> scalar for either head convention: integer h-transform
  support (networks.MZNetworks) or linear [vmin, vmax] two-hot
  (acme_networks.CategoricalMZNetworks)."""
  if hasattr(networks, "num_bins"):
    return lambda logits: two_hot_logits_to_scalar(
        logits, networks.vmin, networks.vmax)
  return lambda logits: logits_to_scalar(logits, networks.support_size)


def make_root_fn(networks: MZNetworks):
  """(params, obs [B, ...]) -> RootFnOutput"""
  decode = _value_head_decoder(networks)

  def root_fn(params: MZParams, obs: jax.Array) -> RootFnOutput:
    embedding = networks.representation.apply(params.representation, obs)
    policy_logits, value_logits = networks.prediction.apply(
        params.prediction, embedding)
    value = decode(value_logits)
    return RootFnOutput(prior_logits=policy_logits, value=value,
                        embedding=embedding)

  return root_fn


def make_recurrent_fn(networks: MZNetworks, discount: float):
  """Search-facing dynamics step: dyn -> pred on the post-transition state."""
  decode = _value_head_decoder(networks)

  def recurrent_fn(params: MZParams, rng: jax.Array, action: jax.Array,
                   embedding: jax.Array):
    del rng
    reward_logits, next_embedding = networks.dynamic.apply(
        params.dynamic, embedding, action)
    policy_logits, value_logits = networks.prediction.apply(
        params.prediction, next_embedding)
    reward = decode(reward_logits)
    value = decode(value_logits)
    batch = action.shape[0]
    output = RecurrentFnOutput(
        reward=reward,
        discount=jnp.full((batch,), discount, reward.dtype),
        prior_logits=policy_logits,
        value=value,
    )
    return output, next_embedding

  return recurrent_fn
