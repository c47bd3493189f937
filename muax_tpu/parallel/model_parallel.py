"""Tensor (model) parallelism for the big conv towers — the ``model`` mesh
axis with real sharding rules behind it.

TPU-native equivalent of the reference's manual multi-GPU ``device_map``
that pins Go-resnet blocks round-robin onto GPUs
(examples/open_spiel/go/run_alphazero.py:136-181): instead of moving whole
blocks between devices, every conv kernel is sharded on its OUTPUT-CHANNEL
dim over the ``model`` axis and XLA GSPMD inserts the collectives
(all-gather for the LayerNorm reductions over channels, reduce-scatter back
into the next conv) — riding ICI, never the host. MuZero-scale MLPs don't
need this (replication saturates ICI first, parallel/mesh.py); the AZ
resnet at Go scale (19 blocks x 256 channels, run_alphazero.py:129-273) is
the workload it exists for.

Composes with data parallelism: a ('data', 'model') mesh shards the batch
on ``data`` and the channels on ``model``.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from muax_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def az_partition_spec(path_leaf, model_size: int):
  """Partition rule for one AZ-resnet parameter array.

  conv kernels [kh, kw, in, out] -> shard out-channels; 1-D channel vectors
  (conv biases, LayerNorm scale/offset) -> shard; dense weights [in, out]
  -> shard the contraction (in) dim, GSPMD turns the matmul into
  partial-matmul + psum; small head biases -> replicate.
  """
  x = path_leaf
  if x.ndim == 4 and x.shape[-1] % model_size == 0:
    return P(None, None, None, MODEL_AXIS)
  if x.ndim == 2 and x.shape[0] % model_size == 0:
    return P(MODEL_AXIS, None)
  if x.ndim == 1 and x.shape[0] % model_size == 0 and x.shape[0] > 1:
    return P(MODEL_AXIS)
  return P()


def shard_az_params(params: Any, mesh: Mesh) -> Any:
  """Place AZ-resnet params channel-sharded over the mesh's ``model`` axis
  (replicated over ``data``). Returns the sharded params pytree."""
  model_size = mesh.shape[MODEL_AXIS]

  def place(x):
    spec = az_partition_spec(x, model_size)
    return jax.device_put(x, NamedSharding(mesh, spec))

  return jax.tree.map(place, params)


def make_model_parallel_apply(network, mesh: Mesh):
  """Jitted (params, obs) -> (policy_logits, value) with the batch sharded
  on ``data`` and channels on ``model``; GSPMD inserts the collectives.

  ``params`` should come from :func:`shard_az_params`; outputs are
  replicated over ``model`` (heads are replicated) and sharded on ``data``.
  """
  batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
  out_sharding = NamedSharding(mesh, P(DATA_AXIS))

  @jax.jit
  def apply(params, obs):
    obs = jax.lax.with_sharding_constraint(obs, batch_sharding)
    policy_logits, value = network.apply(params, obs)
    policy_logits = jax.lax.with_sharding_constraint(policy_logits,
                                                     out_sharding)
    value = jax.lax.with_sharding_constraint(value, out_sharding)
    return policy_logits, value

  return apply


def sharded_fraction(params: Any, mesh: Mesh) -> float:
  """Fraction of parameter COUNT that is actually sharded over ``model`` —
  a placement diagnostic (1.0 would mean every array sharded)."""
  model_size = mesh.shape[MODEL_AXIS]
  total = sharded = 0
  for x in jax.tree.leaves(params):
    n = int(np.prod(x.shape))
    total += n
    if az_partition_spec(x, model_size) != P():
      sharded += n
  return sharded / max(total, 1)
