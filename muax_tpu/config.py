"""Unified configuration tree (SURVEY §5: one dataclass config + flag
front-end replaces the reference's three config idioms)."""
from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class SearchConfig:
  """Search policy settings (reference defaults: muax/policy.py:13-67,
  acme/jax/muzero/config.py:17-35)."""
  policy: str = "muzero"          # muzero | gumbel | stochastic
  num_simulations: int = 50
  max_depth: Optional[int] = None
  dirichlet_fraction: float = 0.25
  dirichlet_alpha: float = 0.3
  pb_c_init: float = 1.25
  pb_c_base: float = 19652.0
  max_num_considered_actions: int = 16  # gumbel
  gumbel_scale: float = 1.0             # gumbel
  num_chance_outcomes: int = 32         # stochastic codebook size
  # Use the fused Pallas search kernel (search/fused.py) when the network
  # family supports it (MLP triplet + muzero/gumbel policy, on a TPU
  # backend); falls back to the generic XLA engine otherwise.
  fused: bool = True
  # Kernel batch-tile rows per grid step (None = auto from the VMEM
  # budget). Larger tiles amortize the per-level loop overhead across more
  # rows; sweep with scripts/tile_sweep.py.
  batch_tile: Optional[int] = None


@dataclasses.dataclass
class ReplayConfig:
  capacity: int = 4096            # segments per shard
  segment_length: int = 20
  min_fill: int = 128             # segments before learning starts
  priority_alpha: float = 0.5     # PNStep alpha (episode_tracer.py:197-249)
  # Offline/online mix (acme/jax/muzero/config.py:61-66): fraction of each
  # learner batch drawn by priority over the whole ring; the remainder is
  # drawn uniformly from the `online_queue_size` newest segments (the FIFO
  # online-queue analog). 1.0 = pure PER (reference standalone behavior).
  offline_fraction: float = 1.0
  online_queue_size: int = 1024


@dataclasses.dataclass
class TrainConfig:
  """End-to-end training settings; defaults target the CartPole parity run
  (BASELINE.md CartPole configs)."""
  num_envs: int = 128
  collect_steps: int = 20          # env steps per iteration (= seg length)
  batch_size: int = 256            # windows per update
  updates_per_iteration: int = 8
  unroll_steps: int = 5            # k
  n_bootstrap: int = 10            # n-step return horizon
  bootstrap_lambda: float = 1.0
  discount: float = 0.997
  l2_coef: float = 1e-4
  gradient_scale: float = 0.5      # hidden-state grad scaling in unroll
  # Temperature schedule (train.py:16-23): fractions of total steps.
  temperature_schedule: tuple = ((0.5, 1.0), (0.75, 0.5), (1.0, 0.25))
  # Samples-per-insert rate gate (Reverb SampleToInsertRatio,
  # acme/jax/muzero/config.py:63-66 + builder.py:128-187): caps sampled
  # windows at `samples_per_insert * inserted_steps * (1 + tolerance)`.
  # None disables the gate (every iteration runs updates_per_iteration).
  samples_per_insert: Optional[float] = None
  spi_tolerance: float = 0.1


@dataclasses.dataclass
class MuZeroConfig:
  search: SearchConfig = dataclasses.field(default_factory=SearchConfig)
  replay: ReplayConfig = dataclasses.field(default_factory=ReplayConfig)
  train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

  def __post_init__(self):
    if self.replay.segment_length != self.train.collect_steps:
      # Segments are produced by the rollout; keep the shapes consistent.
      self.replay.segment_length = self.train.collect_steps
