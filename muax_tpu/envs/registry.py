"""Environment registry: the reference's string-based env selection
(muax/train.py:26-50 takes ``env_id='CartPole-v1'``) for the TPU-native
env zoo.

``make(env_id, num_envs=...)`` resolves, in order:
  1. pure-JAX envs by registered name (case-insensitive, gym-style ``-vN``
     suffixes accepted) — the performance path,
  2. any other string -> a ``GymVectorPool`` over host gymnasium envs
     (requires a local backend; see envs/gym_adapter.py).
"""
from __future__ import annotations

from typing import Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register(name: str, factory: Callable) -> None:
  """Register a pure-JAX env factory under ``name`` (lowercase match)."""
  _REGISTRY[name.lower()] = factory


def _canonical(env_id: str) -> str:
  name = env_id.lower()
  # gym-style version suffixes map onto the pure-JAX implementations.
  for suffix in ("-v0", "-v1", "-v2", "-v3", "-v4", "-v5"):
    if name.endswith(suffix):
      return name[: -len(suffix)]
  return name


def make(env_id: str, num_envs: int = 0, seed: int = 0, **kwargs):
  """Resolve ``env_id`` to an environment instance.

  Pure-JAX envs ignore ``num_envs`` (batching happens at reset time);
  host-gym fallbacks require it.
  """
  key = _canonical(env_id)
  if key in _REGISTRY:
    return _REGISTRY[key](**kwargs)
  from muax_tpu.envs.gym_adapter import GymVectorPool
  if num_envs <= 0:
    raise ValueError(
        f"{env_id!r} is not a registered pure-JAX env "
        f"({sorted(_REGISTRY)}); pass num_envs to build a host gym pool")
  return GymVectorPool(env_id, num_envs=num_envs, seed=seed, **kwargs)


def registered() -> tuple:
  return tuple(sorted(_REGISTRY))


def _install_defaults():
  from muax_tpu.envs.cartpole import CartPole
  from muax_tpu.envs.catch import Catch
  from muax_tpu.envs.connect4 import ConnectFour
  from muax_tpu.envs.pixel import PixelCatch
  from muax_tpu.envs.tictactoe import TicTacToe
  register("cartpole", CartPole)
  register("catch", Catch)
  register("pixelcatch", PixelCatch)
  register("tictactoe", TicTacToe)
  register("connectfour", ConnectFour)
  register("connect4", ConnectFour)


_install_defaults()
