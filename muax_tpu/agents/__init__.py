"""Standalone host-facing agents (reference-API parity layer)."""

from muax_tpu.agents.muzero import MuZero
from muax_tpu.agents.stochastic import StochasticMuZero
from muax_tpu.agents.diffusion import DiffusionMuZero
