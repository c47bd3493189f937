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


def make_smz_fns(networks, discount: float):
  """Root / decision / chance closures for a stochastic 5-network set
  (acme/jax/stochastic_muzero/acting.py:80-130 semantics).

  Returns (root_fn, decision_fn, chance_fn) suitable for
  ``search.stochastic_muzero_policy``.
  """
  del discount  # applied by the policy on chance transitions

  def root_fn(params, obs):
    state = networks.representation.apply(params.representation, obs)
    policy_logits, value_logits = networks.prediction.apply(
        params.prediction, state)
    return RootFnOutput(
        prior_logits=policy_logits,
        value=logits_to_scalar(value_logits, networks.support_size),
        embedding=state)

  def decision_fn(params, rng, action, state):
    del rng
    from muax_tpu.search.types import DecisionRecurrentFnOutput
    afterstate, chance_logits, av_logits = networks.decision.apply(
        params.decision, state, action)
    out = DecisionRecurrentFnOutput(
        chance_logits=chance_logits,
        afterstate_value=logits_to_scalar(av_logits, networks.support_size))
    return out, afterstate

  def chance_fn(params, rng, outcome, afterstate):
    del rng
    from muax_tpu.search.types import ChanceRecurrentFnOutput
    code = jax.nn.one_hot(outcome, networks.num_chance_outcomes,
                          dtype=afterstate.dtype)
    next_state, reward_logits = networks.chance.apply(
        params.chance, afterstate, code)
    policy_logits, value_logits = networks.prediction.apply(
        params.prediction, next_state)
    out = ChanceRecurrentFnOutput(
        action_logits=policy_logits,
        value=logits_to_scalar(value_logits, networks.support_size),
        reward=logits_to_scalar(reward_logits, networks.support_size))
    return out, next_state

  return root_fn, decision_fn, chance_fn


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
