"""Hidden-state normalization used by MuZero-family nets.

Parity: ``min_max_normalize`` / ``min_max_normalize2d``
(reference: muax/nn.py:37-56; acme/jax/muzero/utils.py:73-80).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def min_max_normalize(s: jax.Array, axis=-1, eps: float = 1e-8) -> jax.Array:
  """Per-row min-max scaling of an embedding to [0, 1]."""
  s_min = jnp.min(s, axis=axis, keepdims=True)
  s_max = jnp.max(s, axis=axis, keepdims=True)
  return (s - s_min) / jnp.maximum(s_max - s_min, eps)


def min_max_normalize2d(s: jax.Array, eps: float = 1e-8) -> jax.Array:
  """Per-feature-map min-max scaling for conv embeddings [..., H, W, C]."""
  s_min = jnp.min(s, axis=(-3, -2), keepdims=True)
  s_max = jnp.max(s, axis=(-3, -2), keepdims=True)
  return (s - s_min) / jnp.maximum(s_max - s_min, eps)
