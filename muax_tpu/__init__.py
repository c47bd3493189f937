"""muax_tpu — a TPU-native MuZero / Gumbel MuZero / Stochastic MuZero /
AlphaZero training framework.

Everything — vectorized environments, batched tree search, replay, and the
learner — runs on-device under ``jit`` as one SPMD program, sharded over a
``jax.sharding.Mesh``. Capability parity target: bwfbowen/muax (see SURVEY.md).
"""

__version__ = "0.1.0"

from muax_tpu import ops
from muax_tpu import search
from muax_tpu import models
from muax_tpu import envs
from muax_tpu import replay
from muax_tpu import train
from muax_tpu import parallel
from muax_tpu import agents
from muax_tpu import adapters

# The reference README's top-level spellings (muax.fit / muax.MuZero /
# muax.PNStep, README.md:78-93 — which its own __init__ fails to export at
# this snapshot, muax/__init__.py:1-4) work here:
from muax_tpu.agents import MuZero, StochasticMuZero
from muax_tpu.replay import (
    NStep,
    PNStep,
    Trajectory,
    TrajectoryReplayBuffer,
)
from muax_tpu.train.fit import fit, make_evaluate_fn
