"""Gradient-flow utilities.

Parity: ``scale_gradient`` (reference: muax/utils.py:37-52,
acme/jax/muzero/utils.py:152-154) — identity forward, scaled backward —
used to halve gradient flow through the dynamics unroll (MuZero appendix G).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def scale_gradient(x, scale: float):
  """Identity in the forward pass; multiplies the cotangent by ``scale``."""
  return jax.tree.map(
      lambda t: t * scale + jax.lax.stop_gradient(t) * (1.0 - scale), x)


def clip_gradient(x, clip: float):
  """Identity forward; clips the cotangent elementwise to [-clip, clip]."""

  @jax.custom_vjp
  def _ident(t):
    return t

  def _fwd(t):
    return t, None

  def _bwd(_, g):
    return (jnp.clip(g, -clip, clip),)

  _ident.defvjp(_fwd, _bwd)
  return jax.tree.map(_ident, x)
