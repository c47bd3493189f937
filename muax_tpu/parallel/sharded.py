"""The sharded SPMD training program.

One jitted step runs the whole actor-learner across the mesh:
  * environments, search trees, and replay shards live on the ``data`` axis
    (each shard owns ``num_envs / shards`` envs and its own replay ring),
  * parameters and optimizer state are replicated,
  * gradients are ``psum``-averaged over ``data`` inside the step —
    the collective that replaces ``jax.pmap`` + ``lax.pmean`` + Reverb +
    VariableClient in the reference stack (SURVEY §2i truth table).

Multi-host: the same program under ``jax.distributed.initialize`` — the mesh
spans hosts, the psum rides ICI/DCN, and nothing else changes.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from muax_tpu.config import MuZeroConfig
from muax_tpu.envs.base import AutoResetWrapper
from muax_tpu.models.networks import MZNetworks
from muax_tpu.parallel.mesh import DATA_AXIS
from muax_tpu.replay.buffer import ReplayState, replay_add, replay_init
from muax_tpu.train.actor import make_rollout_fn
from muax_tpu.train.learner import TrainState, make_multi_update_fn


class ShardedProgram(NamedTuple):
  init: Callable       # (rng) -> (train_state, replay_state, env_carry)
  iteration: Callable  # (train_state, replay, env, rng) -> (..., metrics)
  mesh: Mesh
  local_config: MuZeroConfig
  # (train_state, replay_state, rng) -> (replay_state, metrics); present
  # when reanalyze_segments > 0 — every shard refreshes its own replay ring
  # with fresh search under the CURRENT params (the BASELINE north star:
  # reanalyze runs on the data mesh, not a side process).
  reanalyze: Callable | None = None


def _local_config(config: MuZeroConfig, num_shards: int) -> MuZeroConfig:
  """Per-shard view: env batch, learner batch, and replay capacity divide."""
  local = dataclasses.replace(
      config,
      train=dataclasses.replace(
          config.train,
          num_envs=config.train.num_envs // num_shards,
          batch_size=config.train.batch_size // num_shards),
      replay=dataclasses.replace(
          config.replay,
          capacity=max(1, config.replay.capacity // num_shards)),
  )
  return local


def make_sharded_program(
    networks: MZNetworks,
    env: AutoResetWrapper,
    config: MuZeroConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    reanalyze_segments: int = 0,
) -> ShardedProgram:
  """Build the SPMD iteration. ``config`` values are GLOBAL (whole-mesh);
  env batch / learner batch / replay capacity must divide the data axis.

  ``reanalyze_segments`` > 0 also builds ``program.reanalyze``: one SPMD call
  refreshing that many stale segments GLOBALLY (split across shards, each
  searching its own replay shard; schedule it every K iterations from the
  driver)."""
  num_shards = mesh.shape[DATA_AXIS]
  tcfg = config.train
  if tcfg.num_envs % num_shards or tcfg.batch_size % num_shards:
    raise ValueError(
        f"num_envs={tcfg.num_envs} and batch_size={tcfg.batch_size} must "
        f"divide the data-axis size {num_shards}")

  local = _local_config(config, num_shards)
  rollout = make_rollout_fn(networks, env, local)
  multi_update = make_multi_update_fn(networks, optimizer, local,
                                      axis_name=DATA_AXIS)

  def local_iteration(train_state, replay_state, env_carry, rng):
    # Per-shard scalar replay bookkeeping arrives with a length-1 leading
    # axis; unwrap for the local functions.
    replay_state = replay_state.replace(
        cursor=replay_state.cursor[0], total_added=replay_state.total_added[0])
    rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
    rollout_rng, update_rng = jax.random.split(rng)

    env_carry, segments, priorities, roll_metrics = rollout(
        train_state.params, env_carry, rollout_rng,
        train_state.params.temperature)
    replay_state = replay_add(replay_state, segments, priorities,
                              step=train_state.step)
    train_state, replay_state, learn_metrics = multi_update(
        train_state, replay_state, update_rng)

    metrics = {**roll_metrics, **learn_metrics}
    metrics["episodes_finished"] = jax.lax.psum(
        metrics["episodes_finished"], DATA_AXIS)
    metrics = {
        k: (v if k == "episodes_finished" else jax.lax.pmean(v, DATA_AXIS))
        for k, v in metrics.items()
    }
    replay_state = replay_state.replace(
        cursor=replay_state.cursor[None],
        total_added=replay_state.total_added[None])
    return train_state, replay_state, env_carry, metrics

  sharded_iteration = jax.jit(
      shard_map(
          local_iteration,
          mesh=mesh,
          in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
          out_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
          check_vma=False,
      ),
      donate_argnums=(1, 2),
  )

  sharded_reanalyze = None
  if reanalyze_segments:
    from muax_tpu.train.reanalyze import make_reanalyze_fn
    if reanalyze_segments % num_shards:
      raise ValueError(
          f"reanalyze_segments={reanalyze_segments} must divide the "
          f"data-axis size {num_shards}")
    local_reanalyze = make_reanalyze_fn(
        networks, local, reanalyze_segments // num_shards)

    def local_re(train_state, replay_state, rng):
      replay_state = replay_state.replace(
          cursor=replay_state.cursor[0],
          total_added=replay_state.total_added[0])
      rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
      replay_state, metrics = local_reanalyze(
          train_state.params, replay_state, rng, train_state.step)
      metrics = {
          k: (jax.lax.psum(v, DATA_AXIS) if k == "reanalyzed_segments"
              else jax.lax.pmean(v, DATA_AXIS))
          for k, v in metrics.items()
      }
      replay_state = replay_state.replace(
          cursor=replay_state.cursor[None],
          total_added=replay_state.total_added[None])
      return replay_state, metrics

    sharded_reanalyze = jax.jit(
        shard_map(
            local_re,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P()),
            out_specs=(P(DATA_AXIS), P()),
            check_vma=False,
        ),
        donate_argnums=(1,),
    )

  def init(rng):
    init_rng, env_rng = jax.random.split(rng)
    sample_obs = jnp.zeros((1,) + env.spec.observation_shape)
    params = networks.init_params(init_rng, sample_obs)
    train_state = TrainState(params=params, opt_state=optimizer.init(params),
                             step=jnp.asarray(0, jnp.int32))
    train_state = jax.device_put(train_state, NamedSharding(mesh, P()))

    env_carry = env.reset(env_rng, tcfg.num_envs)
    env_carry = jax.device_put(env_carry, NamedSharding(mesh, P(DATA_AXIS)))

    local_replay = replay_init(
        local.replay.capacity, local.train.collect_steps,
        env.spec.observation_shape, networks.num_actions)
    global_replay = jax.tree.map(
        lambda x: jnp.concatenate([x[None]] * num_shards, 0)
        if x.ndim == 0 else jnp.concatenate([x] * num_shards, 0),
        local_replay)
    replay_state = jax.device_put(global_replay,
                                  NamedSharding(mesh, P(DATA_AXIS)))
    return train_state, replay_state, env_carry

  return ShardedProgram(init=init, iteration=sharded_iteration, mesh=mesh,
                        local_config=local, reanalyze=sharded_reanalyze)
