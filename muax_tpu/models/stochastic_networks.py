"""Stochastic MuZero 5-network set (encoder / representation / prediction /
decision / chance).

Capability parity with the reference's SMZ networks
(acme/jax/stochastic_muzero/networks.py:17-210): the encoder maps an
observation to chance-codebook logits (straight-through VQ, codebook size C);
the decision net maps (state, action) to an afterstate + chance logits +
afterstate value; the chance net maps (afterstate, chance outcome) to the
next state + reward.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import haiku as hk
import jax
import jax.numpy as jnp

from muax_tpu.ops import min_max_normalize


class SMZParams(NamedTuple):
  encoder: Any
  representation: Any
  prediction: Any
  decision: Any
  chance: Any
  temperature: jax.Array


class SMZNetworks(NamedTuple):
  """encoder: obs -> code logits [B, C]
  representation: obs -> state
  prediction: state -> (policy_logits [B, A], value_logits [B, 2S+1])
  decision: (state, action) ->
            (afterstate, chance_logits [B, C], afterstate_value_logits)
  chance: (afterstate, code [B, C]) -> (next_state, reward_logits)
  """
  encoder: hk.Transformed
  representation: hk.Transformed
  prediction: hk.Transformed
  decision: hk.Transformed
  chance: hk.Transformed
  num_actions: int
  num_chance_outcomes: int
  support_size: int

  def init_params(self, rng: jax.Array, sample_obs: jax.Array) -> SMZParams:
    ks = jax.random.split(rng, 5)
    enc_params = self.encoder.init(ks[0], sample_obs)
    repr_params = self.representation.init(ks[1], sample_obs)
    state = self.representation.apply(repr_params, sample_obs)
    dummy_action = jnp.zeros((sample_obs.shape[0],), jnp.int32)
    dec_params = self.decision.init(ks[2], state, dummy_action)
    afterstate, _, _ = self.decision.apply(dec_params, state, dummy_action)
    dummy_code = jax.nn.one_hot(
        jnp.zeros((sample_obs.shape[0],), jnp.int32),
        self.num_chance_outcomes)
    ch_params = self.chance.init(ks[3], afterstate, dummy_code)
    pred_params = self.prediction.init(ks[4], state)
    return SMZParams(encoder=enc_params, representation=repr_params,
                     prediction=pred_params, decision=dec_params,
                     chance=ch_params,
                     temperature=jnp.asarray(1.0, jnp.float32))


def straight_through_code(encoder_logits: jax.Array) -> jax.Array:
  """One-hot quantization with a straight-through gradient:
  code = enc + sg(one_hot(argmax(enc)) - enc)
  (reference acme/jax/stochastic_muzero/learning.py:221-240)."""
  probs = jax.nn.softmax(encoder_logits, axis=-1)
  quantized = jax.nn.one_hot(jnp.argmax(encoder_logits, -1),
                             encoder_logits.shape[-1],
                             dtype=encoder_logits.dtype)
  return probs + jax.lax.stop_gradient(quantized - probs)


def make_stochastic_mlp_networks(
    num_actions: int,
    num_chance_outcomes: int = 32,
    embedding_dim: int = 32,
    support_size: int = 20,
    hidden: Sequence[int] = (64,),
) -> SMZNetworks:
  """Dense SMZ set (reference networks.py:77-210 MLP family)."""
  full_support = 2 * support_size + 1

  def mlp(x, sizes):
    h = x
    for size in sizes:
      h = jax.nn.elu(hk.Linear(size)(h))
    return h

  def encoder(obs):
    h = mlp(hk.Flatten()(obs), hidden)
    return hk.Linear(num_chance_outcomes)(h)

  def representation(obs):
    h = mlp(hk.Flatten()(obs), hidden)
    return min_max_normalize(hk.Linear(embedding_dim)(h))

  def prediction(s):
    h = mlp(s, hidden)
    return hk.Linear(num_actions)(h), hk.Linear(full_support)(h)

  def decision(s, a):
    sa = jnp.concatenate(
        [s, jax.nn.one_hot(a, num_actions, dtype=s.dtype)], -1)
    h = mlp(sa, hidden)
    afterstate = min_max_normalize(hk.Linear(embedding_dim)(h))
    chance_logits = hk.Linear(num_chance_outcomes)(h)
    afterstate_value_logits = hk.Linear(full_support)(h)
    return afterstate, chance_logits, afterstate_value_logits

  def chance(afterstate, code):
    h = mlp(jnp.concatenate([afterstate, code], -1), hidden)
    next_state = min_max_normalize(hk.Linear(embedding_dim)(h))
    reward_logits = hk.Linear(full_support)(h)
    return next_state, reward_logits

  t = lambda f: hk.without_apply_rng(hk.transform(f))
  return SMZNetworks(
      encoder=t(encoder), representation=t(representation),
      prediction=t(prediction), decision=t(decision), chance=t(chance),
      num_actions=num_actions, num_chance_outcomes=num_chance_outcomes,
      support_size=support_size)
