"""Multi-host SPMD entry.

The control-plane replacement for the reference's Launchpad process graph
(acme/tf/mcts/agent_distributed.py:257-280): every host runs THIS same
program; ``jax.distributed.initialize`` wires the hosts into one runtime,
the mesh spans all devices, and the sharded program's psum rides ICI within
a host and DCN across hosts. No RPC topology, no variable client — the
parameters are replicated by the collectives themselves.

Usage (same command on every host):

    from muax_tpu.parallel import multihost
    mesh = multihost.initialize_and_make_mesh(
        coordinator_address="10.0.0.1:1234",
        num_processes=4, process_id=<this host's rank>)
    program = make_sharded_program(networks, env, config, optimizer, mesh)

On a single host (or under the driver's virtual-device dry run) the
initialize step is skipped automatically.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax

from muax_tpu.parallel.mesh import DATA_AXIS, make_mesh


def initialize_and_make_mesh(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
):
  """Initialize the multi-host runtime (if configured) and build the global
  mesh over every device of every host.

  Arguments fall back to the standard env vars
  (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), then to
  single-process mode.
  """
  coordinator_address = coordinator_address or os.environ.get(
      "JAX_COORDINATOR_ADDRESS")
  if coordinator_address:
    num_processes = num_processes if num_processes is not None else int(
        os.environ["JAX_NUM_PROCESSES"])
    process_id = process_id if process_id is not None else int(
        os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
  return make_mesh(axis_names=axis_names)


def is_coordinator() -> bool:
  """True on the host that should own logging / checkpoints / eval."""
  return jax.process_index() == 0
