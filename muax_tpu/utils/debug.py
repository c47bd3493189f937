"""Numerics sanitizers: NaN/Inf guards for losses and search outputs.

The reference's only numeric guard is ``check_numerics`` in the Python MCTS
(acme/tf/mcts/search.py:744-747) plus the ``chex.fake_pmap_and_jit`` debug
path (acme/jax/muzero/builder.py:265-266). TPU-native equivalents:

* ``nan_guard()`` — context manager flipping ``jax_debug_nans`` so any NaN
  produced under jit re-runs op-by-op and raises at the producing op.
* ``check_numerics(tree, name)`` — jit-compatible assertion via
  ``checkify``-free ``error_if`` semantics: uses ``jax.debug`` callbacks
  only when enabled, costs nothing when disabled (the call is a no-op at
  trace time).
* ``assert_finite(tree, name)`` — eager host-side check for tests/drivers.

Enable the in-jit checks globally with ``set_check_numerics(True)`` (e.g.
from a debug flag) before tracing; they bake into the compiled program.
"""
from __future__ import annotations

import contextlib
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_CHECK_NUMERICS = False


def set_check_numerics(enabled: bool) -> None:
  """Toggle in-jit NaN/Inf checks for functions traced AFTER this call."""
  global _CHECK_NUMERICS
  _CHECK_NUMERICS = enabled


def check_numerics_enabled() -> bool:
  return _CHECK_NUMERICS


@contextlib.contextmanager
def nan_guard():
  """Within this scope, any NaN produced by a jitted computation raises
  (jax_debug_nans re-runs the program op-by-op to locate it)."""
  prev = jax.config.jax_debug_nans
  jax.config.update("jax_debug_nans", True)
  try:
    yield
  finally:
    jax.config.update("jax_debug_nans", prev)


def check_numerics(tree: Any, name: str = "value") -> Any:
  """Identity that, when checks are enabled at trace time, prints a loud
  message from inside the compiled program if any leaf has NaN/Inf
  (the reference's check_numerics, search.py:744-747, jit-compatible).

  Returns the tree unchanged so it can be used inline:
  ``loss = check_numerics(loss, "loss")``.
  """
  if not _CHECK_NUMERICS:
    return tree

  def check_leaf(path, x):
    if not isinstance(x, jax.Array) and not hasattr(x, "dtype"):
      return x
    if not jnp.issubdtype(x.dtype, jnp.floating):
      return x
    bad = jnp.logical_not(jnp.all(jnp.isfinite(x)))
    jax.lax.cond(
        bad,
        lambda: jax.debug.print(
            "[muax_tpu] NON-FINITE detected in {n} at {p}", n=name,
            p=jax.tree_util.keystr(path)),
        lambda: None)
    return x

  return jax.tree_util.tree_map_with_path(check_leaf, tree)


def assert_finite(tree: Any, name: str = "value") -> None:
  """Eager host-side assertion that every floating leaf is finite."""
  for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
    arr = np.asarray(leaf)
    if np.issubdtype(arr.dtype, np.floating) and not np.all(
        np.isfinite(arr)):
      raise FloatingPointError(
          f"non-finite values in {name} at {jax.tree_util.keystr(path)}")
