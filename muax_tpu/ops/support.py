"""Categorical value-support transforms (the MuZero "two-hot" trick).

Capability parity with the reference's two flavors:
  * integer-support transforms with the invertible h(x) value scaling
    (reference: muax/utils.py:55-167), used by the standalone agent, and
  * rlax-style linear two-hot over ``[vmin, vmax]`` with ``num_bins``
    (reference: muax/frameworks/acme/jax/muzero/learning.py:185-193), used by
    the acme learner's CategoricalCriticHead.

All functions are shape-polymorphic over leading batch dims and jit-safe.
h(x) = sign(x) * (sqrt(|x| + 1) - 1) + eps * x  (arXiv:1805.11593).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-3


def value_transform(x: jax.Array, eps: float = _EPS) -> jax.Array:
  """Invertible scaling h(x) compressing value/reward magnitudes."""
  return jnp.sign(x) * (jnp.sqrt(jnp.abs(x) + 1.0) - 1.0) + eps * x


def inv_value_transform(x: jax.Array, eps: float = _EPS) -> jax.Array:
  """Inverse of :func:`value_transform` (closed form)."""
  return jnp.sign(x) * (
      jnp.square(
          (jnp.sqrt(4.0 * eps * (jnp.abs(x) + 1.0 + eps) + 1.0) - 1.0)
          / (2.0 * eps)
      )
      - 1.0
  )


def scalar_to_support(x: jax.Array, support_size: int) -> jax.Array:
  """Scalar -> two-hot categorical over integer bins [-S, S] after h(x).

  Args:
    x: scalars of shape [...].
    support_size: S; the support has ``2 * S + 1`` bins.

  Returns:
    Probabilities of shape [..., 2 * S + 1].
  """
  x = value_transform(x)
  x = jnp.clip(x, -support_size, support_size)
  low = jnp.floor(x)
  prob_high = x - low
  low_idx = (low + support_size).astype(jnp.int32)
  high_idx = jnp.clip(low_idx + 1, 0, 2 * support_size)
  num_bins = 2 * support_size + 1
  onehot_low = jax.nn.one_hot(low_idx, num_bins, dtype=x.dtype)
  onehot_high = jax.nn.one_hot(high_idx, num_bins, dtype=x.dtype)
  return onehot_low * (1.0 - prob_high)[..., None] + onehot_high * prob_high[..., None]


def support_to_scalar(probs: jax.Array, support_size: int) -> jax.Array:
  """Categorical over [-S, S] -> scalar expectation, then h^-1."""
  bins = jnp.arange(-support_size, support_size + 1, dtype=probs.dtype)
  x = jnp.sum(probs * bins, axis=-1)
  return inv_value_transform(x)


def logits_to_scalar(logits: jax.Array, support_size: int) -> jax.Array:
  """Softmax over logits then :func:`support_to_scalar`."""
  return support_to_scalar(jax.nn.softmax(logits, axis=-1), support_size)


def scalar_to_two_hot(x: jax.Array, num_bins: int, vmin: float, vmax: float) -> jax.Array:
  """rlax-style linear two-hot over ``num_bins`` bins spanning [vmin, vmax].

  No h(x) scaling — this matches the acme critic-head convention
  (reference: acme/jax/muzero/config.py:38-40, 51-bin +-150 default).
  """
  x = jnp.clip(x, vmin, vmax)
  step = (vmax - vmin) / (num_bins - 1)
  pos = (x - vmin) / step
  low = jnp.floor(pos)
  prob_high = pos - low
  low_idx = low.astype(jnp.int32)
  high_idx = jnp.clip(low_idx + 1, 0, num_bins - 1)
  onehot_low = jax.nn.one_hot(low_idx, num_bins, dtype=x.dtype)
  onehot_high = jax.nn.one_hot(high_idx, num_bins, dtype=x.dtype)
  return onehot_low * (1.0 - prob_high)[..., None] + onehot_high * prob_high[..., None]


def two_hot_to_scalar(probs: jax.Array, vmin: float, vmax: float) -> jax.Array:
  """Expectation of a linear two-hot categorical."""
  num_bins = probs.shape[-1]
  bins = jnp.linspace(vmin, vmax, num_bins, dtype=probs.dtype)
  return jnp.sum(probs * bins, axis=-1)


def two_hot_logits_to_scalar(logits: jax.Array, vmin: float, vmax: float) -> jax.Array:
  return two_hot_to_scalar(jax.nn.softmax(logits, axis=-1), vmin, vmax)
