"""The jitted vectorized actor: scan over {search -> env.step -> write}.

Replaces the reference's host-Python episode loop (muax/train.py:178-197, one
env step per `model.act` with a device->host sync each time, SURVEY §3.1)
with a `lax.scan` over T steps of B environments — search, stepping, and
target computation all stay on device.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from muax_tpu.config import MuZeroConfig
from muax_tpu.envs.base import AutoResetWrapper, AutoResetState
from muax_tpu.models.networks import MZNetworks, MZParams
from muax_tpu.ops import segment_n_step_returns
from muax_tpu.search import gumbel_muzero_policy, muzero_policy
from muax_tpu.train.inference import make_root_fn, make_recurrent_fn
from muax_tpu.types import Transition


def make_policy_fn(networks: MZNetworks, config: MuZeroConfig,
                   discount: float, eval_mode: bool = False):
  """(params, rng, obs, temperature, invalid_actions=None) ->
  (action, pi, root_value).

  ``eval_mode`` disables the Dirichlet exploration noise on the root prior —
  greedy evaluation should not randomize its root (the reference evaluates
  through the noisy training policy, muax/test.py:5-48; this is a
  deliberate improvement).
  """
  search = config.search
  dirichlet_fraction = 0.0 if eval_mode else search.dirichlet_fraction

  if search.policy == "stochastic":
    from muax_tpu.search import stochastic_muzero_policy
    from muax_tpu.train.inference import make_smz_fns
    smz_root_fn, decision_fn, chance_fn = make_smz_fns(networks, discount)

    def _maybe_smz_fused(params):
      # Fused decision/chance forest kernel (search/fused.py SMZ section):
      # the whole A' = A + C tree in VMEM. Beyond throughput, it sidesteps
      # the pure-XLA path's pinned TPU-runtime fault at 512 envs x 200
      # sims (VERDICT r3 weak #2 / BENCH_MATRIX_r03 note): the faulting
      # [B, N, A+C] HBM tree arrays never exist.
      if not getattr(search, "fused", False) or jax.default_backend() == "cpu":
        return None
      if not hasattr(networks, "num_chance_outcomes"):
        return None
      from muax_tpu.search.fused import extract_smz_fused_weights
      return extract_smz_fused_weights(networks, params)

    def policy_fn(params, rng, obs, temperature, invalid_actions=None):
      root = smz_root_fn(params, obs)
      weights = _maybe_smz_fused(params)
      if weights is not None:
        from muax_tpu.search.fused import fused_smz_policy
        action, action_weights, root_value = fused_smz_policy(
            params, rng, root, weights,
            num_simulations=search.num_simulations,
            num_chance_outcomes=networks.num_chance_outcomes,
            support_size=networks.support_size,
            discount=discount,
            invalid_actions=invalid_actions,
            max_depth=search.max_depth,
            dirichlet_fraction=dirichlet_fraction,
            dirichlet_alpha=search.dirichlet_alpha,
            pb_c_init=search.pb_c_init,
            pb_c_base=search.pb_c_base,
            temperature=temperature,
            batch_tile=search.batch_tile)
        return action, action_weights, root_value
      out = stochastic_muzero_policy(
          params, rng, root,
          decision_recurrent_fn=decision_fn,
          chance_recurrent_fn=chance_fn,
          num_simulations=search.num_simulations,
          num_chance_outcomes=networks.num_chance_outcomes,
          max_depth=search.max_depth,
          invalid_actions=invalid_actions,
          dirichlet_fraction=dirichlet_fraction,
          dirichlet_alpha=search.dirichlet_alpha,
          pb_c_init=search.pb_c_init,
          pb_c_base=search.pb_c_base,
          temperature=temperature,
          discount=discount)
      return (out.action, out.action_weights,
              out.search_tree.summary().value)

    return policy_fn

  root_fn = make_root_fn(networks)
  recurrent_fn = make_recurrent_fn(networks, discount)

  # The fused Pallas kernel covers the flagship paths: MuZero PUCT and
  # Gumbel MuZero over the plain MLP triplet with the integer-support heads.
  # It is compiled on TPU backends and interpreted on CPU, so the sharded
  # CPU dry-run keeps using the generic XLA engine (same semantics,
  # test-checked parity).
  def _maybe_fused_weights(params):
    if (search.policy not in ("muzero", "gumbel")
        or not getattr(search, "fused", False)
        or jax.default_backend() == "cpu"):
      return None
    if hasattr(networks, "support_size"):
      from muax_tpu.search.fused import extract_fused_weights
      return extract_fused_weights(networks, params)
    if hasattr(networks, "num_bins"):
      from muax_tpu.search.fused import extract_categorical_fused_weights
      return extract_categorical_fused_weights(networks, params)
    return None

  def policy_fn(params: MZParams, rng: jax.Array, obs: jax.Array,
                temperature, invalid_actions=None):
    root = root_fn(params, obs)
    fused_weights = _maybe_fused_weights(params)
    if fused_weights is not None and search.policy == "muzero":
      from muax_tpu.search.fused import fused_mlp_muzero_policy
      return fused_mlp_muzero_policy(
          params, rng, root, fused_weights,
          num_simulations=search.num_simulations,
          support_size=getattr(networks, "support_size", None),
          discount=discount,
          max_depth=search.max_depth,
          invalid_actions=invalid_actions,
          dirichlet_fraction=dirichlet_fraction,
          dirichlet_alpha=search.dirichlet_alpha,
          pb_c_init=search.pb_c_init,
          pb_c_base=search.pb_c_base,
          temperature=temperature,
          batch_tile=getattr(search, "batch_tile", None))
    if fused_weights is not None and search.policy == "gumbel":
      from muax_tpu.search.fused import fused_mlp_gumbel_policy
      return fused_mlp_gumbel_policy(
          params, rng, root, fused_weights,
          num_simulations=search.num_simulations,
          support_size=getattr(networks, "support_size", None),
          discount=discount,
          max_depth=search.max_depth,
          invalid_actions=invalid_actions,
          max_num_considered_actions=search.max_num_considered_actions,
          gumbel_scale=search.gumbel_scale,
          batch_tile=getattr(search, "batch_tile", None))
    if search.policy == "muzero":
      out = muzero_policy(
          params, rng, root, recurrent_fn,
          num_simulations=search.num_simulations,
          max_depth=search.max_depth,
          invalid_actions=invalid_actions,
          dirichlet_fraction=dirichlet_fraction,
          dirichlet_alpha=search.dirichlet_alpha,
          pb_c_init=search.pb_c_init,
          pb_c_base=search.pb_c_base,
          temperature=temperature)
    elif search.policy == "gumbel":
      out = gumbel_muzero_policy(
          params, rng, root, recurrent_fn,
          num_simulations=search.num_simulations,
          max_depth=search.max_depth,
          invalid_actions=invalid_actions,
          max_num_considered_actions=search.max_num_considered_actions,
          gumbel_scale=search.gumbel_scale)
    else:
      raise ValueError(f"Unknown search policy {search.policy!r}")
    root_value = out.search_tree.summary().value
    return out.action, out.action_weights, root_value

  return policy_fn


def make_rollout_fn(networks: MZNetworks, env: AutoResetWrapper,
                    config: MuZeroConfig):
  """Build rollout(params, env_carry, rng, temperature) ->
  (env_carry, segments [B, T, ...], step_priorities [B, T], metrics).

  Targets (n-step Rn bootstrapped from stored search values,
  acme/jax/muzero/learning.py:258-267 semantics) and PER priorities
  |v - Rn|^alpha (episode_tracer.py:197-249) are computed vectorized at
  segment end — the ``compute_Rn_and_weights`` pattern
  (sb3/common/buffers.py:154-181), not a host deque tracer.
  """
  policy_fn = make_policy_fn(networks, config, config.train.discount)
  tcfg = config.train

  def rollout(params: MZParams, carry: AutoResetState, rng: jax.Array,
              temperature):
    def step_fn(scan_carry, rng_t):
      ar_state = scan_carry
      policy_rng, env_rng = jax.random.split(rng_t)
      legal = (env.legal_action_mask(ar_state)
               if hasattr(env, "legal_action_mask") else None)
      invalid = None if legal is None else 1.0 - legal
      action, pi, root_value = policy_fn(params, policy_rng, ar_state.obs,
                                         temperature, invalid)
      new_ar, reward, done, info = env.step(ar_state, action, env_rng)
      store = dict(obs=ar_state.obs, action=action, reward=reward,
                   done=done, value=root_value, pi=pi,
                   episode_return=info["episode_return"])
      return new_ar, store

    rngs = jax.random.split(rng, tcfg.collect_steps)
    carry, steps = jax.lax.scan(step_fn, carry, rngs)

    # [T, B] -> targets; bootstrap across the segment cut from stored values.
    rn = segment_n_step_returns(
        steps["reward"], steps["value"], steps["done"].astype(jnp.float32),
        tcfg.discount, tcfg.n_bootstrap, tcfg.bootstrap_lambda)
    priorities = jnp.abs(steps["value"] - rn) ** config.replay.priority_alpha

    def to_bt(x):  # [T, B, ...] -> [B, T, ...]
      return jnp.swapaxes(x, 0, 1)

    batch_size = steps["action"].shape[1]
    segments = Transition(
        obs=to_bt(steps["obs"]),
        action=to_bt(steps["action"]),
        reward=to_bt(steps["reward"]),
        done=to_bt(steps["done"]),
        rn=to_bt(rn),
        value=to_bt(steps["value"]),
        pi=to_bt(steps["pi"]),
        weight=jnp.ones((batch_size,), jnp.float32),
        mask=jnp.ones_like(to_bt(rn)),
    )
    dones = steps["done"]
    num_episodes = jnp.sum(dones)
    metrics = {
        "episodes_finished": num_episodes,
        # Mean return over episodes that finished in this segment.
        "mean_episode_return": jnp.sum(
            jnp.where(dones, steps["episode_return"], 0.0))
        / jnp.maximum(num_episodes, 1),
        "mean_root_value": jnp.mean(steps["value"]),
    }
    return carry, segments, to_bt(priorities) + 1e-6, metrics

  return rollout
