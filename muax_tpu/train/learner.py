"""The jitted learner: sample -> unrolled loss -> optax -> priority refresh.

Replaces the reference's MZLearner step (acme/jax/muzero/learning.py:269-301)
with a fully on-device update chained directly onto the device replay —
no host iterator, no Reverb round-trip. Data-parallel gradient reduction is
layered on by muax_tpu.parallel (psum over the mesh, replacing
pmap/lax.pmean at learning.py:130-151).
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from muax_tpu.config import MuZeroConfig
from muax_tpu.models.losses import muzero_loss
from muax_tpu.models.networks import MZNetworks, MZParams
from muax_tpu.replay.buffer import (
    ReplayState,
    replay_sample,
    replay_update_priorities,
)


class TrainState(NamedTuple):
  """Parity with the reference TrainingState (learning.py:34-40)."""
  params: MZParams
  opt_state: Any
  step: jax.Array


def make_update_fn(networks: MZNetworks, optimizer: optax.GradientTransformation,
                   config: MuZeroConfig, axis_name: str | None = None):
  """Build update(train_state, replay_state, rng) ->
  (train_state, replay_state, metrics). One sampled batch, one grad step."""
  tcfg = config.train
  is_stochastic = hasattr(networks, "chance")

  def update(train_state: TrainState, replay_state: ReplayState,
             rng: jax.Array):
    rng, aug_rng = jax.random.split(rng)
    batch, seg_idx, starts = replay_sample(
        replay_state, rng, tcfg.batch_size, tcfg.unroll_steps,
        offline_fraction=config.replay.offline_fraction,
        online_queue_size=config.replay.online_queue_size)
    if tcfg.observation_transform is not None:
      # Dataset-side image augmentation on the sampled batch only
      # (reference observation_transform, acme/jax/muzero/config.py:69-71
      # applied in make_dataset_iterator, builder.py:194-199). Stored and
      # rollout observations are never touched.
      batch = batch.replace(
          obs=tcfg.observation_transform(aug_rng, batch.obs))

    def loss_fn(params):
      if is_stochastic:
        from muax_tpu.models.stochastic_losses import stochastic_muzero_loss
        return stochastic_muzero_loss(
            params, batch, networks,
            l2_coef=tcfg.l2_coef,
            gradient_scale=tcfg.gradient_scale,
            priority_alpha=config.replay.priority_alpha)
      return muzero_loss(
          params, batch, networks,
          l2_coef=tcfg.l2_coef,
          gradient_scale=tcfg.gradient_scale,
          priority_alpha=config.replay.priority_alpha)

    grads, metrics = jax.grad(loss_fn, has_aux=True)(train_state.params)
    # No-op unless utils.set_check_numerics(True) was called before tracing
    # (the reference's check_numerics guard, tf/mcts/search.py:744-747).
    from muax_tpu.utils.debug import check_numerics
    grads = check_numerics(grads, "grads")
    if axis_name is not None:
      grads = jax.lax.pmean(grads, axis_name)
    updates, opt_state = optimizer.update(grads, train_state.opt_state,
                                          train_state.params)
    new_params = optax.apply_updates(train_state.params, updates)
    # Temperature is actor state, not a learnable weight: restore it.
    new_params = new_params._replace(temperature=train_state.params.temperature)

    replay_state = replay_update_priorities(
        replay_state, seg_idx, starts, metrics.priorities + 1e-6)
    new_state = TrainState(params=new_params, opt_state=opt_state,
                           step=train_state.step + 1)
    out_metrics = {
        "loss": metrics.total,
        "reward_loss": metrics.reward_loss,
        "value_loss": metrics.value_loss,
        "policy_loss": metrics.policy_loss,
        "l2_loss": metrics.l2_loss,
        "grad_norm": optax.global_norm(grads),
        # How old (in learner steps) the sampled windows' pi/value/rn targets
        # are — the staleness ledger reanalyze burns down (Reanalyze,
        # Schrittwieser et al. 2020 appendix H; stubbed in the reference at
        # acme/jax/muzero/utils.py:25-70).
        "target_staleness": jnp.mean(
            (train_state.step - replay_state.target_step[seg_idx])
            .astype(jnp.float32)),
    }
    return new_state, replay_state, out_metrics

  return update


def make_multi_update_fn(networks, optimizer, config: MuZeroConfig,
                         axis_name: str | None = None):
  """scan of N updates per call (the gradient_steps_per_learner_step=8
  batching idea, acme/jax/muzero/config.py:30-32).

  ``multi_update(..., num_allowed=None)``: when given, only the first
  ``num_allowed`` of the N scanned updates execute (lax.cond skips the
  rest) — the hook the samples-per-insert rate gate in ``fit`` uses to
  reproduce Reverb's SampleToInsertRatio limiter (builder.py:128-187).
  """
  update = make_update_fn(networks, optimizer, config, axis_name)
  n = config.train.updates_per_iteration

  def multi_update(train_state: TrainState, replay_state: ReplayState,
                   rng: jax.Array, num_allowed=None):
    def body(carry, xs):
      i, rng_i = xs
      ts, rs = carry
      if num_allowed is None:
        ts, rs, metrics = update(ts, rs, rng_i)
        executed = jnp.float32(1.0)
      else:
        def run(ops):
          ts_, rs_ = ops
          ts_, rs_, m = update(ts_, rs_, rng_i)
          return ts_, rs_, m
        def skip(ops):
          ts_, rs_ = ops
          zero = {k: jnp.float32(0.0) for k in (
              "loss", "reward_loss", "value_loss", "policy_loss",
              "l2_loss", "grad_norm", "target_staleness")}
          return ts_, rs_, zero
        executed = (i < num_allowed).astype(jnp.float32)
        ts, rs, metrics = jax.lax.cond(i < num_allowed, run, skip, (ts, rs))
      return (ts, rs), {**metrics, "updates_done": executed}

    xs = (jnp.arange(n), jax.random.split(rng, n))
    (train_state, replay_state), metrics = jax.lax.scan(
        body, (train_state, replay_state), xs)
    done = jnp.maximum(jnp.sum(metrics["updates_done"]), 1.0)
    mean_metrics = {
        k: (jnp.sum(v) / done if k != "updates_done" else jnp.sum(v))
        for k, v in metrics.items()}
    return train_state, replay_state, mean_metrics

  return multi_update
