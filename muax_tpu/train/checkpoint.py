"""Checkpointing: full training-state snapshots + deterministic resume.

Parity targets:
  * params/opt-state npy save-load (muax/model.py:203-212, learner
    save/restore acme/jax/muzero/learning.py:310-314),
  * the acme CheckpointingConfig cadence that snapshots BOTH learner state
    and replay tables (examples/rl_discrete/run_muzero.py:107-110) — here a
    full checkpoint carries train state + on-device replay ring + env carry
    + the RNG cursor + driver counters, so ``fit(resume_from=...)`` continues
    bit-exactly where it stopped (pure-JAX envs; host pools resume their
    device-side carry, host-process state is re-seeded like a restarted
    Reverb-less actor).

Multi-host: only the coordinator (process 0) writes; other processes no-op
(the jax.distributed analog of acme's single Checkpointer process). State in
a multi-host fit is replicated (params) or host-local (replay shard) — for
host-local shards pass ``per_host=True`` to write one file per process.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

CHECKPOINT_VERSION = 2


def save_pytree(path: str, tree: Any) -> None:
  if jax.process_index() != 0:
    return
  os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
  host_tree = jax.tree.map(np.asarray, tree)
  tmp = path + ".tmp"
  with open(tmp, "wb") as f:
    pickle.dump(host_tree, f)
  os.replace(tmp, path)  # atomic: a crash mid-write can't corrupt the file


def load_pytree(path: str) -> Any:
  with open(path, "rb") as f:
    return pickle.load(f)


def _host_path(path: str, per_host: bool) -> str:
  if per_host and jax.process_count() > 1:
    return f"{path}.host{jax.process_index()}"
  return path


def save_checkpoint(path: str, *, train_state: Any, replay_state: Any,
                    env_carry: Any, rng: jax.Array, iteration: int,
                    counters: Optional[dict] = None,
                    per_host: bool = False) -> None:
  """Snapshot everything ``fit`` needs to continue deterministically."""
  payload = {
      "version": CHECKPOINT_VERSION,
      "train_state": train_state,
      "replay_state": replay_state,
      "env_carry": env_carry,
      "rng": rng,
      "iteration": iteration,
      "counters": dict(counters or {}),
  }
  if per_host and jax.process_count() > 1:
    target = _host_path(path, per_host=True)
    os.makedirs(os.path.dirname(os.path.abspath(target)), exist_ok=True)
    host_tree = jax.tree.map(np.asarray, payload)
    tmp = target + ".tmp"
    with open(tmp, "wb") as f:
      pickle.dump(host_tree, f)
    os.replace(tmp, target)
  else:
    save_pytree(path, payload)


def load_checkpoint(path: str, per_host: bool = False) -> dict:
  """Load a snapshot; leaves come back as device arrays."""
  payload = load_pytree(_host_path(path, per_host))
  version = payload.get("version")
  if version != CHECKPOINT_VERSION:
    raise ValueError(f"checkpoint version {version} != "
                     f"{CHECKPOINT_VERSION} at {path}")
  out = dict(payload)
  for key in ("train_state", "replay_state", "env_carry", "rng"):
    out[key] = jax.tree.map(jnp.asarray, payload[key])
  return out
