"""Checkpointing: params + optimizer state + counters.

Parity with the reference's npy save/load of {params, optimizer_state}
(muax/model.py:203-212) and the learner save/restore (learning.py:310-314),
generalized to arbitrary pytrees. Multi-host sharded checkpointing arrives
with the parallel driver (SURVEY §5 checkpoint/resume).
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
  os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
  host_tree = jax.tree.map(np.asarray, tree)
  with open(path, "wb") as f:
    pickle.dump(host_tree, f)


def load_pytree(path: str) -> Any:
  with open(path, "rb") as f:
    return pickle.load(f)
