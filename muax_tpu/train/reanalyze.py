"""Reanalyze: refresh stale replay targets with fresh search.

Realizes the intent the reference only stubs
(acme/jax/muzero/utils.py:25-70 ``get_priority_fn_with_reanalyse`` and the
online/offline table mix, config.py:61): idle accelerator time re-runs the
search policy with CURRENT parameters over stored observations and rewrites
``pi`` (fresh visit distributions), ``value`` (fresh root values), ``rn``
(n-step returns re-bootstrapped from fresh values), and step priorities —
the MuZero Reanalyze recipe (Schrittwieser et al. 2020, appendix H).

One jitted call refreshes ``num_segments`` whole segments; schedule it
between training iterations or on dedicated mesh shards.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from muax_tpu.config import MuZeroConfig
from muax_tpu.models.networks import MZNetworks
from muax_tpu.ops import segment_n_step_returns
from muax_tpu.replay.buffer import ReplayState
from muax_tpu.train.actor import make_policy_fn


def make_reanalyze_fn(networks: MZNetworks, config: MuZeroConfig,
                      num_segments: int):
  """Build reanalyze(params, replay_state, rng) -> (replay_state, metrics).

  ``config.search.reanalyze_simulations`` (when set) runs the refresh
  search at a reduced budget — the ReZero recipe (arXiv:2404.16364):
  target quality degrades gracefully with budget, so cheaper searches
  over more of the buffer beat full-budget searches over less of it."""
  if config.search.reanalyze_simulations is not None:
    import dataclasses
    config = dataclasses.replace(
        config, search=dataclasses.replace(
            config.search,
            num_simulations=config.search.reanalyze_simulations))
  # eval_mode: the refresh search runs WITHOUT root Dirichlet noise — the
  # point of reanalyze is to rewrite stored targets with the best current
  # estimate, not to re-inject exploration noise into the whole buffer
  # (r4 ablation: noised refresh measurably degraded the learning curve).
  policy_fn = make_policy_fn(networks, config, config.train.discount,
                             eval_mode=True)
  tcfg = config.train
  L = tcfg.collect_steps

  def reanalyze(params, replay_state: ReplayState, rng: jax.Array,
                step: jax.Array | int = 0):
    seg_rng, search_rng = jax.random.split(rng)
    # Stalest-first: sample by target age (filled slots only), so the
    # freshness ledger burns down where it matters most. Inverse-CDF draw
    # via the same fused compare+count as replay/buffer.py (TPU
    # searchsorted lowers to a log2(C) gather loop) — same distribution
    # as categorical without materializing a [num_segments, capacity]
    # Gumbel matrix.
    C = replay_state.capacity
    filled = jnp.arange(C) < replay_state.size
    age = (jnp.asarray(step, jnp.int32) - replay_state.target_step).astype(
        jnp.float32)
    # Same distribution as the previous categorical over log1p(age)
    # logits: weight = exp(log1p(age)) = 1 + age.
    weights = jnp.where(filled, 1.0 + jnp.maximum(age, 0.0), 0.0)
    cdf = jnp.cumsum(weights)
    u = jax.random.uniform(seg_rng, (num_segments,)) * cdf[-1]
    seg_idx = jnp.clip(
        jnp.sum((u[:, None] >= cdf[None, :]).astype(jnp.int32), axis=1),
        0, C - 1)

    obs = replay_state.obs[seg_idx]          # [K, L, ...]
    flat_obs = obs.reshape((num_segments * L,) + obs.shape[2:])
    # Fresh search on every stored position, temperature from params.
    _, pi, root_value = policy_fn(params, search_rng, flat_obs,
                                  params.temperature)
    pi = pi.reshape(num_segments, L, -1)
    values = root_value.reshape(num_segments, L)

    rewards = replay_state.reward[seg_idx]
    dones = replay_state.done[seg_idx].astype(jnp.float32)
    # Recompute per segment ([L] time axis -> vmap over K).
    rn = jax.vmap(
        lambda r, v, d: segment_n_step_returns(
            r, v, d, tcfg.discount, tcfg.n_bootstrap,
            tcfg.bootstrap_lambda))(rewards, values, dones)
    priorities = (jnp.abs(values - rn)
                  ** config.replay.priority_alpha) + 1e-6

    new_state = replay_state.replace(
        pi=replay_state.pi.at[seg_idx].set(pi),
        value=replay_state.value.at[seg_idx].set(values),
        rn=replay_state.rn.at[seg_idx].set(rn),
        step_priorities=replay_state.step_priorities.at[seg_idx]
        .set(priorities),
        target_step=replay_state.target_step.at[seg_idx].set(
            jnp.asarray(step, jnp.int32)),
    )
    metrics = {
        "reanalyzed_segments": jnp.asarray(num_segments),
        "reanalyze_value_shift": jnp.mean(
            jnp.abs(values - replay_state.value[seg_idx])),
        "reanalyzed_target_age": jnp.mean(age[seg_idx]),
    }
    return new_state, metrics

  return reanalyze
