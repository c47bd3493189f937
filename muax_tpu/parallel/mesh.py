"""Device mesh construction.

The TPU-native replacement for the reference's process topology: instead of
Launchpad actor/learner process graphs (acme/tf/mcts/agent_distributed.py:
257-280), the whole agent is one SPMD program over a
``jax.sharding.Mesh``. Axes:
  * ``data``  — env-batch / search-batch / replay sharding (the scaling axis,
    SURVEY §5 long-context note),
  * ``model`` — optional tensor sharding for large nets (the manual
    device_map of examples/open_spiel/go/run_alphazero.py:129-273).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(mesh_shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = (DATA_AXIS,),
              devices=None) -> Mesh:
  """Build a mesh over all (or the given) devices.

  Default: 1-D data mesh over every device — the right layout for
  MuZero-scale nets where replication + data sharding saturates ICI.
  """
  devices = devices if devices is not None else jax.devices()
  if mesh_shape is None:
    mesh_shape = (len(devices),) + (1,) * (len(axis_names) - 1)
  if int(np.prod(mesh_shape)) != len(devices):
    raise ValueError(
        f"mesh shape {mesh_shape} does not cover {len(devices)} devices")
  device_array = np.asarray(devices).reshape(mesh_shape)
  return Mesh(device_array, axis_names=tuple(axis_names))


def data_sharding(mesh: Mesh) -> NamedSharding:
  """Leading-axis sharding over the data axis."""
  return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())
