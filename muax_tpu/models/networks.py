"""MuZero network triplets (representation / prediction / dynamic).

Three families with capability parity to the reference's ``muax/nn.py``:
  * MLP triplet (nn.py:59-115) — vector observations,
  * EfficientZero-style conv stack (nn.py:180-309) — pixel observations,
  * AlphaZero-ish ResNet (nn.py:313-395) — board/planes observations.

Value and reward heads emit categorical logits over an integer support
[-S, S] (converted with muax_tpu.ops.support); hidden states are min-max
normalized (nn.py:37-56). The parameter container carries the actor
temperature (the temperature-in-params trick of
acme/jax/muzero/networks.py:16-20) so the learner can refresh it without a
separate channel.

TPU notes: all dense/conv compute sits on the MXU; shapes are static; the
triplet is evaluated batched ([B, ...]) everywhere including inside the
search loop.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Sequence

import haiku as hk
import jax
import jax.numpy as jnp

from muax_tpu.ops import min_max_normalize, min_max_normalize2d


class MZParams(NamedTuple):
  """Learnable state for the triplet + the actor temperature scalar."""
  representation: Any
  prediction: Any
  dynamic: Any
  temperature: jax.Array


class MZNetworks(NamedTuple):
  """hk-transformed triplet plus static metadata.

  representation: obs [B, ...] -> embedding [B, ...]
  prediction:     embedding -> (policy_logits [B, A], value_logits [B, 2S+1])
  dynamic:        (embedding, action [B]) ->
                  (reward_logits [B, 2S+1], next_embedding)
  """
  representation: hk.Transformed
  prediction: hk.Transformed
  dynamic: hk.Transformed
  num_actions: int
  support_size: int

  def init_params(self, rng: jax.Array, sample_obs: jax.Array) -> MZParams:
    """Chain-init repr -> pred -> dyn (reference order, model.py:74-79)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    repr_params = self.representation.init(k1, sample_obs)
    embedding = self.representation.apply(repr_params, sample_obs)
    pred_params = self.prediction.init(k2, embedding)
    dummy_action = jnp.zeros((sample_obs.shape[0],), jnp.int32)
    dyn_params = self.dynamic.init(k3, embedding, dummy_action)
    return MZParams(representation=repr_params, prediction=pred_params,
                    dynamic=dyn_params,
                    temperature=jnp.asarray(1.0, jnp.float32))


# ---------------------------------------------------------------------------
# MLP family (vector observations)
# ---------------------------------------------------------------------------


def make_mlp_networks(
    num_actions: int,
    embedding_dim: int = 8,
    support_size: int = 10,
    repr_layers: Sequence[int] = (16,),
    pred_layers: Sequence[int] = (16,),
    dyn_layers: Sequence[int] = (16,),
) -> MZNetworks:
  """Small dense triplet; defaults near the reference CartPole config
  (README.md:99-132: embed 8, support 10)."""
  full_support = 2 * support_size + 1

  def representation(obs):
    h = hk.Flatten()(obs)
    for size in repr_layers:
      h = jax.nn.elu(hk.Linear(size)(h))
    h = hk.Linear(embedding_dim)(h)
    return min_max_normalize(h)

  def prediction(s):
    h = s
    for size in pred_layers:
      h = jax.nn.elu(hk.Linear(size)(h))
    value_logits = hk.Linear(full_support)(h)
    policy_logits = hk.Linear(num_actions)(h)
    return policy_logits, value_logits

  def dynamic(s, a):
    sa = jnp.concatenate(
        [s, jax.nn.one_hot(a, num_actions, dtype=s.dtype)], axis=-1)
    h = sa
    for size in dyn_layers:
      h = jax.nn.elu(hk.Linear(size)(h))
    reward_logits = hk.Linear(full_support)(h)
    next_state = hk.Linear(embedding_dim)(h)
    return reward_logits, min_max_normalize(next_state)

  return MZNetworks(
      representation=hk.without_apply_rng(hk.transform(representation)),
      prediction=hk.without_apply_rng(hk.transform(prediction)),
      dynamic=hk.without_apply_rng(hk.transform(dynamic)),
      num_actions=num_actions,
      support_size=support_size,
  )


# ---------------------------------------------------------------------------
# Residual conv blocks (shared by the conv families)
# ---------------------------------------------------------------------------


class ResidualConvBlock(hk.Module):
  """LayerNorm pre-activation residual conv block (EfficientZero-style,
  reference nn.py:118-177)."""

  def __init__(self, channels: int, stride: int = 1, use_projection=False,
               name=None):
    super().__init__(name=name)
    self._channels = channels
    self._stride = stride
    self._use_projection = use_projection

  def __call__(self, x):
    shortcut = x
    h = hk.LayerNorm(axis=(-3, -2, -1), create_scale=True,
                     create_offset=True)(x)
    h = jax.nn.relu(h)
    if self._use_projection:
      shortcut = hk.Conv2D(self._channels, 1, stride=self._stride)(h)
    h = hk.Conv2D(self._channels, 3, stride=self._stride)(h)
    h = hk.LayerNorm(axis=(-3, -2, -1), create_scale=True,
                     create_offset=True)(h)
    h = jax.nn.relu(h)
    h = hk.Conv2D(self._channels, 3)(h)
    return h + shortcut


def _conv_torso(x, channels: int, num_blocks: int, downsample: bool):
  h = hk.Conv2D(channels, 3, stride=2 if downsample else 1)(x)
  for i in range(num_blocks):
    h = ResidualConvBlock(channels, name=f"block_{i}")(h)
  return h


def _categorical_heads(h, num_actions: int, full_support: int):
  flat = hk.Flatten()(h)
  torso = jax.nn.relu(hk.Linear(128)(flat))
  value_logits = hk.Linear(full_support)(torso)
  policy_logits = hk.Linear(num_actions)(torso)
  return policy_logits, value_logits


def make_efficientzero_networks(
    num_actions: int,
    support_size: int = 20,
    channels: int = 32,
    num_blocks: int = 2,
    downsample: bool = True,
) -> MZNetworks:
  """Conv triplet for pixel observations [B, H, W, C] (EfficientZero stack,
  reference nn.py:180-309). Dynamics receives the action as a broadcast
  plane appended to the state channels.

  ``downsample`` applies the reference EZStateEncoder's FULL 16x spatial
  reduction (conv s2 -> block -> block s2 -> block -> avgpool/2 -> block
  -> avgpool/2 -> block, nn.py:189-206): 80x80 frames become 5x5 latents.
  This is also what makes conv search tractable — the tree stores
  [B, num_nodes, h, w, C] latents, and an under-downsampled 40x40 latent
  costs 64x the HBM of the reference's 5x5 (measured: the 32-sim forest
  goes from 1.7 GB to 27 MB at B=256)."""
  full_support = 2 * support_size + 1

  def representation(obs):
    # Integer frames (uint8 pixel storage) promote to f32; float inputs
    # keep their dtype so the bf16 learner path (losses.py compute_dtype)
    # runs the whole stack in bf16.
    x = (obs if jnp.issubdtype(obs.dtype, jnp.floating)
         else obs.astype(jnp.float32))
    if downsample:
      h = hk.Conv2D(max(channels // 2, 1), 3, stride=2)(x)
      h = ResidualConvBlock(max(channels // 2, 1), name="enc_block_0")(h)
      h = ResidualConvBlock(channels, stride=2, use_projection=True,
                            name="enc_down_1")(h)
      h = ResidualConvBlock(channels, name="enc_block_1")(h)
      h = hk.AvgPool((3, 3, 1), (2, 2, 1), "SAME")(h)
      h = ResidualConvBlock(channels, name="enc_block_2")(h)
      h = hk.AvgPool((3, 3, 1), (2, 2, 1), "SAME")(h)
      h = ResidualConvBlock(channels, name="enc_block_3")(h)
    else:
      h = _conv_torso(x, channels, num_blocks, downsample=False)
    return min_max_normalize2d(h)

  def prediction(s):
    h = ResidualConvBlock(channels, name="pred_block")(s)
    return _categorical_heads(h, num_actions, full_support)

  def dynamic(s, a):
    plane = jnp.broadcast_to(
        (a.astype(s.dtype) / num_actions)[:, None, None, None],
        s.shape[:-1] + (1,))
    h = jnp.concatenate([s, plane], axis=-1)
    h = hk.Conv2D(channels, 3)(h)
    for i in range(num_blocks):
      h = ResidualConvBlock(channels, name=f"dyn_block_{i}")(h)
    flat = hk.Flatten()(jax.nn.relu(h))
    reward_logits = hk.Linear(full_support)(jax.nn.relu(
        hk.Linear(64)(flat)))
    return reward_logits, min_max_normalize2d(h)

  return MZNetworks(
      representation=hk.without_apply_rng(hk.transform(representation)),
      prediction=hk.without_apply_rng(hk.transform(prediction)),
      dynamic=hk.without_apply_rng(hk.transform(dynamic)),
      num_actions=num_actions,
      support_size=support_size,
  )


def make_resnet_networks(
    num_actions: int,
    support_size: int = 20,
    channels: int = 64,
    num_blocks: int = 4,
) -> MZNetworks:
  """AlphaZero-flavored plane-input ResNet triplet (reference nn.py:313-395)
  for board observations [B, H, W, P]."""
  full_support = 2 * support_size + 1

  def representation(obs):
    x = (obs if jnp.issubdtype(obs.dtype, jnp.floating)
         else obs.astype(jnp.float32))
    h = _conv_torso(x, channels, num_blocks, downsample=False)
    return min_max_normalize2d(h)

  def prediction(s):
    h = ResidualConvBlock(channels, name="pred_block")(s)
    return _categorical_heads(h, num_actions, full_support)

  def dynamic(s, a):
    plane = jnp.broadcast_to(
        (a.astype(s.dtype) / num_actions)[:, None, None, None],
        s.shape[:-1] + (1,))
    h = hk.Conv2D(channels, 3)(jnp.concatenate([s, plane], axis=-1))
    for i in range(num_blocks):
      h = ResidualConvBlock(channels, name=f"dyn_block_{i}")(h)
    flat = hk.Flatten()(jax.nn.relu(h))
    reward_logits = hk.Linear(full_support)(jax.nn.relu(hk.Linear(64)(flat)))
    return reward_logits, min_max_normalize2d(h)

  return MZNetworks(
      representation=hk.without_apply_rng(hk.transform(representation)),
      prediction=hk.without_apply_rng(hk.transform(prediction)),
      dynamic=hk.without_apply_rng(hk.transform(dynamic)),
      num_actions=num_actions,
      support_size=support_size,
  )
