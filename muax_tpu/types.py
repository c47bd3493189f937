"""Shared data structures flowing between rollout, replay, and learner."""
from __future__ import annotations

from typing import Optional

import flax.struct as struct
import jax


@struct.dataclass
class Transition:
  """A window of experience, batched [B, L, ...] (or a single step [ ...]).

  Field parity with the reference's Transition pytree
  (muax/episode_tracer.py:40-68): obs, a, r, done, Rn, v, pi, w.
  ``mask`` marks steps that belong to the episode (pre-terminal);
  targets after a terminal are invalid and the loss zeroes them.
  """
  obs: jax.Array        # [B, L, ...]
  action: jax.Array     # [B, L] int32
  reward: jax.Array     # [B, L]
  done: jax.Array       # [B, L] bool
  rn: jax.Array         # [B, L] n-step bootstrapped return target
  value: jax.Array      # [B, L] search value at t
  pi: jax.Array         # [B, L, A] search action weights
  weight: jax.Array     # [B] PER importance weight
  mask: jax.Array       # [B, L] validity of each unroll step
