"""AlphaZero-style policy/value networks (no learned dynamics).

Parity with the reference's tf MCTS path, where the search walks the REAL
environment (acme/tf/mcts/models/simulator.py) guided by a policy/value net
(examples/open_spiel/go/run_alphazero.py:129-273). Value head is a tanh
scalar in [-1, 1] (two-player outcome convention).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import haiku as hk
import jax
import jax.numpy as jnp


class AZParams(NamedTuple):
  network: Any
  temperature: jax.Array


class AZNetwork(NamedTuple):
  """network: obs [B, ...] -> (policy_logits [B, A], value [B] in [-1,1])"""
  network: hk.Transformed
  num_actions: int

  def init_params(self, rng: jax.Array, sample_obs: jax.Array) -> AZParams:
    return AZParams(network=self.network.init(rng, sample_obs),
                    temperature=jnp.asarray(1.0, jnp.float32))

  def apply(self, params: AZParams, obs: jax.Array):
    return self.network.apply(params.network, obs)


def make_az_mlp(num_actions: int,
                hidden: Sequence[int] = (128, 128)) -> AZNetwork:
  def network(obs):
    h = hk.Flatten()(obs)
    for size in hidden:
      h = jax.nn.relu(hk.Linear(size)(h))
    policy_logits = hk.Linear(num_actions)(h)
    value = jnp.tanh(hk.Linear(1)(h))[..., 0]
    return policy_logits, value

  return AZNetwork(network=hk.without_apply_rng(hk.transform(network)),
                   num_actions=num_actions)


def make_az_resnet(num_actions: int, channels: int = 64,
                   num_blocks: int = 4) -> AZNetwork:
  """Conv tower for plane observations [B, H, W, P] (the Go resnet shape,
  run_alphazero.py:129-273, at configurable width/depth)."""
  from muax_tpu.models.networks import ResidualConvBlock

  def network(obs):
    h = hk.Conv2D(channels, 3)(obs.astype(jnp.float32))
    for i in range(num_blocks):
      h = ResidualConvBlock(channels, name=f"block_{i}")(h)
    h = jax.nn.relu(h)
    flat = hk.Flatten()(h)
    policy_logits = hk.Linear(num_actions)(flat)
    value_h = jax.nn.relu(hk.Linear(64)(flat))
    value = jnp.tanh(hk.Linear(1)(value_h))[..., 0]
    return policy_logits, value

  return AZNetwork(network=hk.without_apply_rng(hk.transform(network)),
                   num_actions=num_actions)
