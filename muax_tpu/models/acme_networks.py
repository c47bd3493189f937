"""acme-style network families with linear two-hot categorical heads.

Capability parity with the reference's acme-jax networks
(acme/jax/muzero/networks.py:55-216):
  * ``make_categorical_mlp_networks`` — LayerNormMLP towers with
    CategoricalCriticHead-style linear two-hot value/reward heads over
    ``num_bins`` bins spanning ``[vmin, vmax]`` (51 bins, ±150 by default,
    reference networks.py:55-136),
  * ``make_fc_resnet_networks`` — pre-LayerNorm fully-connected residual
    tower with a 0..600 two-hot support (the 2048-style config, reference
    networks.py:138-216).

Both emit the same (representation, prediction, dynamic) triplet interface
as ``models.networks.MZNetworks`` so they flow through the shared loss,
inference, and search code; the head convention is distinguished by the
presence of ``num_bins`` (see ``models.losses._target_codec`` and
``train.inference._value_head_decoder``).

TPU notes: towers are plain dense stacks (MXU-friendly); LayerNorm and
activations fuse into the matmuls under XLA.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import haiku as hk
import jax
import jax.numpy as jnp

from muax_tpu.models.networks import MZParams
from muax_tpu.ops import min_max_normalize


class CategoricalMZNetworks(NamedTuple):
  """Triplet with rlax-style linear two-hot heads.

  representation: obs [B, ...] -> embedding [B, D]
  prediction:     embedding -> (policy_logits [B, A], value_logits [B, bins])
  dynamic:        (embedding, action [B]) ->
                  (reward_logits [B, bins], next_embedding [B, D])
  """
  representation: hk.Transformed
  prediction: hk.Transformed
  dynamic: hk.Transformed
  num_actions: int
  num_bins: int
  vmin: float
  vmax: float

  def init_params(self, rng: jax.Array, sample_obs: jax.Array) -> MZParams:
    """Chain-init repr -> pred -> dyn (reference order,
    acme/jax/muzero/networks.py:31-52)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    repr_params = self.representation.init(k1, sample_obs)
    embedding = self.representation.apply(repr_params, sample_obs)
    pred_params = self.prediction.init(k2, embedding)
    dummy_action = jnp.zeros((sample_obs.shape[0],), jnp.int32)
    dyn_params = self.dynamic.init(k3, embedding, dummy_action)
    return MZParams(representation=repr_params, prediction=pred_params,
                    dynamic=dyn_params,
                    temperature=jnp.asarray(1.0, jnp.float32))


def _layer_norm_mlp(h: jax.Array, layer_sizes: Sequence[int]) -> jax.Array:
  """acme LayerNormMLP idiom: first layer Linear->LayerNorm->tanh, the rest
  Linear->elu (reference uses acme's networks_lib.LayerNormMLP)."""
  if not layer_sizes:
    return h
  h = hk.Linear(layer_sizes[0])(h)
  h = hk.LayerNorm(axis=-1, create_scale=True, create_offset=True)(h)
  h = jnp.tanh(h)
  for size in layer_sizes[1:]:
    h = jax.nn.elu(hk.Linear(size)(h))
  return h


def make_categorical_mlp_networks(
    num_actions: int,
    embedding_dim: int = 64,
    num_bins: int = 51,
    vmin: float = -150.0,
    vmax: float = 150.0,
    layer_sizes: Sequence[int] = (256, 256, 256),
) -> CategoricalMZNetworks:
  """LayerNormMLP towers + linear two-hot heads (reference
  acme/jax/muzero/networks.py:55-136; defaults config.py:38-40)."""

  def representation(obs):
    h = _layer_norm_mlp(hk.Flatten()(obs), layer_sizes)
    h = hk.Linear(embedding_dim)(h)
    return min_max_normalize(h)

  def prediction(s):
    h = _layer_norm_mlp(s, layer_sizes)
    policy_logits = hk.Linear(num_actions)(h)
    value_logits = hk.Linear(num_bins)(h)
    return policy_logits, value_logits

  def dynamic(s, a):
    sa = jnp.concatenate(
        [s, jax.nn.one_hot(a, num_actions, dtype=s.dtype)], axis=-1)
    h = _layer_norm_mlp(sa, layer_sizes)
    reward_logits = hk.Linear(num_bins)(h)
    next_state = hk.Linear(embedding_dim)(h)
    return reward_logits, min_max_normalize(next_state)

  return CategoricalMZNetworks(
      representation=hk.without_apply_rng(hk.transform(representation)),
      prediction=hk.without_apply_rng(hk.transform(prediction)),
      dynamic=hk.without_apply_rng(hk.transform(dynamic)),
      num_actions=num_actions,
      num_bins=num_bins,
      vmin=float(vmin),
      vmax=float(vmax),
  )


class _PreLNResBlock(hk.Module):
  """Pre-LayerNorm linear residual block (reference's fully-connected
  resnet, acme/jax/muzero/networks.py:138-216)."""

  def __init__(self, width: int, name=None):
    super().__init__(name=name)
    self._width = width

  def __call__(self, x):
    h = hk.LayerNorm(axis=-1, create_scale=True, create_offset=True)(x)
    h = jax.nn.elu(hk.Linear(self._width)(h))
    h = hk.Linear(self._width)(h)
    return x + h


def _fc_resnet_tower(h: jax.Array, width: int, num_blocks: int) -> jax.Array:
  h = hk.Linear(width)(h)
  for i in range(num_blocks):
    h = _PreLNResBlock(width, name=f"block_{i}")(h)
  return hk.LayerNorm(axis=-1, create_scale=True, create_offset=True)(h)


def make_fc_resnet_networks(
    num_actions: int,
    embedding_dim: int = 256,
    num_bins: int = 601,
    vmin: float = 0.0,
    vmax: float = 600.0,
    num_blocks: int = 10,
) -> CategoricalMZNetworks:
  """Fully-connected residual tower with a 0..600 support (the 2048-style
  config, reference acme/jax/muzero/networks.py:138-216)."""

  def representation(obs):
    h = _fc_resnet_tower(hk.Flatten()(obs), embedding_dim, num_blocks)
    return min_max_normalize(h)

  def prediction(s):
    h = _PreLNResBlock(embedding_dim, name="pred_block")(s)
    policy_logits = hk.Linear(num_actions)(h)
    value_logits = hk.Linear(num_bins)(h)
    return policy_logits, value_logits

  def dynamic(s, a):
    sa = jnp.concatenate(
        [s, jax.nn.one_hot(a, num_actions, dtype=s.dtype)], axis=-1)
    h = _fc_resnet_tower(sa, embedding_dim, num_blocks)
    reward_logits = hk.Linear(num_bins)(h)
    next_state = hk.Linear(embedding_dim)(h)
    return reward_logits, min_max_normalize(next_state)

  return CategoricalMZNetworks(
      representation=hk.without_apply_rng(hk.transform(representation)),
      prediction=hk.without_apply_rng(hk.transform(prediction)),
      dynamic=hk.without_apply_rng(hk.transform(dynamic)),
      num_actions=num_actions,
      num_bins=num_bins,
      vmin=float(vmin),
      vmax=float(vmax),
  )
