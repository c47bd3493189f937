"""Frame-level observation transforms.

Parity: ``diff_transform_matrix`` / ``diff_transform`` (Pascal-matrix frame
differencing, reference: muax/utils.py:105-167) and ``action2plane``
(muax/utils.py:222-223) broadcasting a discrete action into an image plane.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def diff_transform_matrix(num_frames: int, dtype=jnp.float32) -> jax.Array:
  """[num_frames, num_frames] matrix of alternating-sign binomial coefficients.

  Column k holds the finite-difference stencil of order k, so
  ``frames @ M`` maps stacked frames to (last frame, 1st diff, 2nd diff, ...).
  """
  n = num_frames
  m = np.zeros((n, n), dtype=np.float64)
  for k in range(n):
    for i in range(k + 1):
      m[n - 1 - i, k] = ((-1) ** i) * math.comb(k, i)
  return jnp.asarray(m, dtype=dtype)


def diff_transform(x: jax.Array, dtype=jnp.float32) -> jax.Array:
  """Apply the Pascal diff transform over the trailing frame-stack axis."""
  num_frames = x.shape[-1]
  m = diff_transform_matrix(num_frames, dtype=dtype)
  return jnp.asarray(x, dtype) @ m


def action2plane(action: jax.Array, shape: tuple[int, ...],
                 num_actions: int | None = None,
                 dtype=jnp.float32) -> jax.Array:
  """Broadcast a scalar action to a constant plane of ``shape``.

  If ``num_actions`` is given the plane value is ``a / num_actions``
  (AlphaZero-style scaled action plane); otherwise the raw action value.
  """
  a = jnp.asarray(action, dtype)
  if num_actions is not None:
    a = a / num_actions
  return jnp.broadcast_to(a.reshape(a.shape + (1,) * len(shape)),
                          a.shape + tuple(shape))
