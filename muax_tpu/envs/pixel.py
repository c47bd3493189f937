"""Pixel-observation environments (pure JAX, in-jit).

The reference's pixel path is ALE Atari behind dm-acme wrappers: 84x84
grayscale, zero-discount on life loss, frame stacking
(/root/reference/examples/rl_discrete/helpers.py:71-107) feeding the
EfficientZero conv family (/root/reference/muax/nn.py:180-309). A host
Atari pool would bottleneck a TPU at >100k steps/s, so the TPU-native
equivalent is (a) pure-JAX pixel envs that render on device and (b) the
``GymVectorPool`` escape hatch for real ALE. This module provides (a):

  * ``PixelObsEnv`` — renders any 2D-board env's observation as an
    ``[H*scale, W*scale, 1]`` image (nearest-neighbor upsample),
  * ``PixelCatch`` — the Catch behavioral benchmark at pixel scale, the
    learning test bed for the conv families.

Compose with ``FrameStackingEnv(stack=False)`` for the channel-stacked
frames the conv nets expect (wrappers.py parity of muax/wrappers.py:443-506).
"""
from __future__ import annotations

import jax.numpy as jnp

from muax_tpu.envs.base import Environment, EnvSpec
from muax_tpu.envs.catch import Catch


class PixelObsEnv(Environment):
  """Wrap a 2D-observation env; observations become [H*s, W*s, 1] f32 images.

  Dynamics, rewards, and termination pass through unchanged, so behavioral
  guarantees of the inner env (e.g. Catch's provable optimal action) carry
  over to the pixel domain — exactly what a conv-family learning test needs.
  """

  def __init__(self, env: Environment, scale: int = 8, dtype=jnp.float32):
    if len(env.spec.observation_shape) != 2:
      raise ValueError("PixelObsEnv wraps 2D-board observations, got "
                       f"{env.spec.observation_shape}")
    self.env = env
    self.scale = scale
    self.dtype = dtype
    h, w = env.spec.observation_shape
    self.spec = EnvSpec(
        observation_shape=(h * scale, w * scale, 1),
        num_actions=env.spec.num_actions,
        max_episode_steps=env.spec.max_episode_steps,
        # uint8 frames ride the raw-byte replay path (EnvSpec.obs_dtype):
        # the reference's ALE frames are uint8 for the same reason
        # (examples/rl_discrete/helpers.py:90-103).
        obs_dtype=None if dtype == jnp.float32 else dtype)

  def _render(self, board: jnp.ndarray) -> jnp.ndarray:
    img = jnp.repeat(jnp.repeat(board, self.scale, axis=0), self.scale,
                     axis=1)
    return img[..., None].astype(self.dtype)

  def reset(self, rng):
    state, obs = self.env.reset(rng)
    return state, self._render(obs)

  def step(self, state, action):
    state, obs, reward, done = self.env.step(state, action)
    return state, self._render(obs), reward, done


class PixelCatch(PixelObsEnv):
  """Catch rendered as pixels — the conv-family learning benchmark.

  ``PixelCatch(rows=10, columns=5, scale=8)`` gives 80x80x1 frames, the
  closest pure-JAX analog of the reference's 84x84 Atari configuration
  (examples/rl_discrete/helpers.py:90-103). ``dtype=jnp.uint8`` stores
  frames as raw bytes end-to-end (replay ring included)."""

  def __init__(self, rows: int = 10, columns: int = 5, scale: int = 8,
               dtype=jnp.float32):
    super().__init__(Catch(rows=rows, columns=columns), scale=scale,
                     dtype=dtype)
