"""Reanalyze: fresh-search target refresh on replay."""
import jax
import jax.numpy as jnp
import numpy as np

from muax_tpu.config import MuZeroConfig, ReplayConfig, SearchConfig, TrainConfig
from muax_tpu.models import make_mlp_networks
from muax_tpu.replay import replay_add, replay_init
from muax_tpu.train.reanalyze import make_reanalyze_fn
from muax_tpu.types import Transition


def test_reanalyze_rewrites_targets():
  config = MuZeroConfig(
      search=SearchConfig(num_simulations=4),
      replay=ReplayConfig(capacity=16, min_fill=4),
      train=TrainConfig(num_envs=4, collect_steps=6, batch_size=4,
                        unroll_steps=3, n_bootstrap=5))
  networks = make_mlp_networks(2, embedding_dim=8, support_size=10)
  params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))

  K, L = 8, 6
  rng = jax.random.PRNGKey(1)
  segments = Transition(
      obs=jax.random.normal(rng, (K, L, 4)),
      action=jnp.zeros((K, L), jnp.int32),
      reward=jnp.ones((K, L)),
      done=jnp.zeros((K, L), bool),
      rn=jnp.full((K, L), 123.0),        # stale targets
      value=jnp.full((K, L), 123.0),
      pi=jnp.ones((K, L, 2)) * jnp.asarray([0.9, 0.1]),
      weight=jnp.ones((K,)),
      mask=jnp.ones((K, L)),
  )
  replay = replay_init(16, L, (4,), 2)
  replay = replay_add(replay, segments, jnp.ones((K, L)))

  reanalyze = jax.jit(make_reanalyze_fn(networks, config, num_segments=16))
  new_replay, metrics = reanalyze(params, replay, jax.random.PRNGKey(2))

  filled = np.arange(16) < 8
  vals = np.asarray(new_replay.value)[filled]
  # Sampling is with replacement, so identify refreshed rows (stale = 123).
  refreshed = np.any(vals != 123.0, axis=1)
  assert refreshed.sum() >= 4  # 16 draws over 8 slots hit most of them
  # Refreshed values are fresh bounded search values, not the stale 123.
  assert np.all(np.abs(vals[refreshed]) < 100.0)
  # Fresh pi is a distribution on refreshed rows.
  pis = np.asarray(new_replay.pi)[filled][refreshed]
  np.testing.assert_allclose(pis.sum(-1), 1.0, rtol=1e-4)
  # Rn recomputed from reward=1 everywhere: bounded, not the stale 123.
  assert np.all(np.asarray(new_replay.rn)[filled][refreshed] < 100.0)
  assert float(metrics["reanalyze_value_shift"]) > 0.0


def test_reanalyze_only_touches_filled_slots():
  config = MuZeroConfig(
      search=SearchConfig(num_simulations=2),
      train=TrainConfig(num_envs=2, collect_steps=4, batch_size=2,
                        unroll_steps=2, n_bootstrap=2))
  networks = make_mlp_networks(2, embedding_dim=8, support_size=10)
  params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
  L = 4
  replay = replay_init(8, L, (4,), 2)
  seg = Transition(
      obs=jnp.zeros((2, L, 4)), action=jnp.zeros((2, L), jnp.int32),
      reward=jnp.zeros((2, L)), done=jnp.zeros((2, L), bool),
      rn=jnp.zeros((2, L)), value=jnp.zeros((2, L)),
      pi=jnp.ones((2, L, 2)) / 2, weight=jnp.ones((2,)),
      mask=jnp.ones((2, L)))
  replay = replay_add(replay, seg, jnp.ones((2, L)))
  reanalyze = jax.jit(make_reanalyze_fn(networks, config, num_segments=8))
  new_replay, _ = reanalyze(params, replay, jax.random.PRNGKey(1))
  # Unfilled slots (2..7) untouched (still zero priorities beyond writes).
  np.testing.assert_array_equal(np.asarray(new_replay.obs[2:]), 0.0)


def test_reduced_budget_reanalyze():
  """ReZero-style cheap refresh (search.reanalyze_simulations): runs at
  the reduced budget, still rewrites pi/value/rn, and the original config
  is not mutated."""
  config = MuZeroConfig(
      search=SearchConfig(num_simulations=16, reanalyze_simulations=2),
      train=TrainConfig(num_envs=2, collect_steps=4, batch_size=2,
                        unroll_steps=2, n_bootstrap=2))
  networks = make_mlp_networks(2, embedding_dim=8, support_size=10)
  params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
  L = 4
  replay = replay_init(8, L, (4,), 2)
  seg = Transition(
      obs=jax.random.normal(jax.random.PRNGKey(3), (4, L, 4)),
      action=jnp.zeros((4, L), jnp.int32),
      reward=jnp.ones((4, L)), done=jnp.zeros((4, L), bool),
      rn=jnp.zeros((4, L)), value=jnp.zeros((4, L)),
      pi=jnp.ones((4, L, 2)) / 2, weight=jnp.ones((4,)),
      mask=jnp.ones((4, L)))
  replay = replay_add(replay, seg, jnp.ones((4, L)))
  reanalyze = jax.jit(make_reanalyze_fn(networks, config, num_segments=4))
  new_replay, metrics = reanalyze(params, replay, jax.random.PRNGKey(1))
  assert config.search.num_simulations == 16  # untouched
  assert int(metrics["reanalyzed_segments"]) == 4
  # Targets actually rewritten (rn was zero; rewards are 1 -> rn > 0).
  assert float(jnp.max(jnp.abs(new_replay.rn[:4]))) > 0.1
  # Fresh pi sums to 1 over actions.
  np.testing.assert_allclose(np.asarray(new_replay.pi[:4].sum(-1)), 1.0,
                             rtol=1e-5)
