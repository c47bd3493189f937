"""Batched 2048 via the native C++ pool (native/env2048.cpp).

Game2048 parity with the reference's vendored example
(examples/rl_discrete/game2048/, which trains on jumanji's Game2048-v1).
The C++ pool advances all N boards in worker threads; the device program
sees one batched io_callback per rollout step. Implements the
AutoResetWrapper interface (reset(rng, batch)/step(carry, action, rng)) so
``fit`` and ``make_rollout_fn`` accept it unchanged; ``invalid_actions``
for the search come from ``carry`` infos / the `legal_mask` attribute.

Builds the shared library on first use if it is missing (g++ required).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import jax
import jax.experimental
import jax.numpy as jnp
import numpy as np

from muax_tpu.envs.base import AutoResetState, EnvSpec

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")


def _load_library() -> ctypes.CDLL:
  so_path = os.path.join(_NATIVE_DIR, "libenv2048.so")
  src_path = os.path.join(_NATIVE_DIR, "env2048.cpp")
  if not os.path.exists(so_path) or (
      os.path.exists(src_path)
      and os.path.getmtime(src_path) > os.path.getmtime(so_path)):
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-o", so_path,
         src_path],
        check=True, cwd=_NATIVE_DIR)
  lib = ctypes.CDLL(so_path)
  lib.env2048_create.restype = ctypes.c_void_p
  lib.env2048_create.argtypes = [ctypes.c_int, ctypes.c_uint64, ctypes.c_int]
  lib.env2048_destroy.argtypes = [ctypes.c_void_p]
  f32p = ctypes.POINTER(ctypes.c_float)
  lib.env2048_observe.argtypes = [ctypes.c_void_p, f32p, f32p]
  lib.env2048_reset_all.argtypes = [ctypes.c_void_p]
  lib.env2048_step.argtypes = [
      ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), f32p, f32p,
      ctypes.POINTER(ctypes.c_uint8), f32p]
  return lib


class Native2048Pool:
  """N native 2048 boards; observation [4, 4] tile exponents (float32)."""

  def __init__(self, num_envs: int, seed: int = 0,
               num_threads: Optional[int] = None,
               max_episode_steps: int = 2048):
    self._lib = _load_library()
    self.num_envs = num_envs
    threads = num_threads or min(8, os.cpu_count() or 1)
    self._handle = ctypes.c_void_p(self._lib.env2048_create(
        num_envs, seed, threads))
    self.spec = EnvSpec(observation_shape=(4, 4), num_actions=4,
                        max_episode_steps=max_episode_steps)
    self._last_mask = np.ones((num_envs, 4), np.float32)

  def __del__(self):
    if getattr(self, "_handle", None):
      self._lib.env2048_destroy(self._handle)
      self._handle = None

  # -- host side -----------------------------------------------------------
  def _host_reset_all(self):
    self._lib.env2048_reset_all(self._handle)
    obs = np.zeros((self.num_envs, 16), np.float32)
    mask = np.zeros((self.num_envs, 4), np.float32)
    self._lib.env2048_observe(
        self._handle,
        obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    self._last_mask = mask
    return obs.reshape(self.num_envs, 4, 4), mask

  def _host_step(self, action):
    action = np.ascontiguousarray(np.asarray(action), np.int32)
    obs = np.zeros((self.num_envs, 16), np.float32)
    reward = np.zeros((self.num_envs,), np.float32)
    done = np.zeros((self.num_envs,), np.uint8)
    mask = np.zeros((self.num_envs, 4), np.float32)
    self._lib.env2048_step(
        self._handle,
        action.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        reward.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        done.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    self._last_mask = mask
    return (obs.reshape(self.num_envs, 4, 4), reward,
            done.astype(bool), mask)

  # -- device-facing API ---------------------------------------------------
  def legal_action_mask(self, carry: AutoResetState):
    """The pool carries the C++-computed [B, 4] legal mask device-side in
    ``env_state``; the rollout feeds it to the search as invalid_actions."""
    return carry.env_state

  def reset(self, rng: jax.Array, batch_size: int) -> AutoResetState:
    del rng
    if batch_size != self.num_envs:
      raise ValueError(f"batch_size {batch_size} != pool {self.num_envs}")
    obs, mask = jax.experimental.io_callback(
        self._host_reset_all,
        (jax.ShapeDtypeStruct((self.num_envs, 4, 4), jnp.float32),
         jax.ShapeDtypeStruct((self.num_envs, 4), jnp.float32)),
        ordered=True)
    return AutoResetState(
        env_state=mask,  # carry the legal mask device-side
        obs=obs,
        episode_step=jnp.zeros(self.num_envs, jnp.int32),
        episode_return=jnp.zeros(self.num_envs, jnp.float32))

  def step(self, carry: AutoResetState, action: jax.Array, rng: jax.Array):
    del rng
    obs, reward, done, mask = jax.experimental.io_callback(
        self._host_step,
        (jax.ShapeDtypeStruct((self.num_envs, 4, 4), jnp.float32),
         jax.ShapeDtypeStruct((self.num_envs,), jnp.float32),
         jax.ShapeDtypeStruct((self.num_envs,), jnp.bool_),
         jax.ShapeDtypeStruct((self.num_envs, 4), jnp.float32)),
        action, ordered=True)
    episode_return = carry.episode_return + reward
    new_carry = AutoResetState(
        env_state=mask,
        obs=obs,
        episode_step=jnp.where(done, 0, carry.episode_step + 1),
        episode_return=jnp.where(done, 0.0, episode_return))
    info = {"terminated": done, "truncated": jnp.zeros_like(done),
            "episode_return": episode_return, "legal_mask": mask}
    return new_carry, reward, done, info
