"""Stock image augmentations for the dataset-side observation transform.

The reference exposes an ``observation_transform`` hook for image
augmentation in the learner's data pipeline
(acme/jax/muzero/config.py:69-71, builder.py:194-199) without shipping
transforms. These are the standard MuZero/EfficientZero pair (random
shift + random intensity, as in DrQ, arXiv:2004.13649 — the augmentations
EfficientZero trains with): pure functions with the hook's
``transform(rng, obs)`` signature, vectorized over ``[B, L, H, W, C]``
batches with one shift per trajectory window (consistent across the
unroll, which is what makes the dynamics-model targets stay valid).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def random_shift(rng: jax.Array, obs: jax.Array, pad: int = 4) -> jax.Array:
  """Random +/-``pad``-pixel translation with edge-replication padding.

  One shift per leading-batch element, shared across every other leading
  axis (the unroll window) so all L frames of a window move together.
  Accepts ``[B, H, W, C]`` or ``[B, L, H, W, C]``.
  """
  batched_window = obs.ndim == 5
  if not batched_window:
    obs = obs[:, None]
  B, L, H, W, C = obs.shape
  padded = jnp.pad(obs, ((0, 0), (0, 0), (pad, pad), (pad, pad), (0, 0)),
                   mode="edge")
  shift = jax.random.randint(rng, (B, 2), 0, 2 * pad + 1)
  rows = shift[:, 0, None] + jnp.arange(H)[None, :]          # [B, H]
  cols = shift[:, 1, None] + jnp.arange(W)[None, :]          # [B, W]
  out = padded[jnp.arange(B)[:, None, None, None],
               jnp.arange(L)[None, :, None, None],
               rows[:, None, :, None],
               cols[:, None, None, :]]
  return out if batched_window else out[:, 0]


def random_intensity(rng: jax.Array, obs: jax.Array,
                     scale: float = 0.05) -> jax.Array:
  """Per-window multiplicative intensity jitter: obs * (1 + scale * n),
  n ~ N(0, 1) clipped to [-2, 2] (the EfficientZero setting)."""
  B = obs.shape[0]
  noise = jnp.clip(jax.random.normal(rng, (B,)), -2.0, 2.0)
  factor = 1.0 + scale * noise
  return obs * factor.reshape((B,) + (1,) * (obs.ndim - 1))


def drq_augmentation(pad: int = 4, intensity_scale: float = 0.05):
  """The standard pair composed, ready for
  ``TrainConfig.observation_transform``:

      config.train.observation_transform = drq_augmentation()
  """

  def transform(rng: jax.Array, obs: jax.Array) -> jax.Array:
    k1, k2 = jax.random.split(rng)
    return random_intensity(k2, random_shift(k1, obs, pad),
                            intensity_scale)

  transform.__name__ = f"drq_pad{pad}_int{intensity_scale}"
  return transform
