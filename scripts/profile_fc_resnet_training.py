"""Decompose the 601-bin FC-resnet SPI=32 training iteration
(BENCH_MATRIX_r05 `fc_resnet_training`, 17.8k env-steps/s): where does the
time go — the 64-sim fused search over the 10-block residual tower, the
jax.grad learner (hybrid fused-sampler feed, no raw kernel — the residual
backward is not hand-derived, models/fused_learner.py:24-25), or
sampling/glue?

Answers whether a LearnerSpec for the residual family (the one network
family still on jax.grad) would move the row, or whether it is
search-bound like SMZ. Same in-jit scan methodology as
profile_smz_training.py (single dispatches over the axon tunnel are
~30 ms floor noise).
"""
import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

NUM_ENVS = 512
COLLECT = 20
SIMS = 64
BATCH = 1024
SPI = 32.0
TILE = 256


def sync(x):
  return float(jnp.asarray(x).reshape(-1)[0])


def best_of(f, n=3):
  ts = []
  for _ in range(n):
    t0 = time.time()
    f()
    ts.append(time.time() - t0)
  return min(ts)


def main():
  from muax_tpu.config import (MuZeroConfig, ReplayConfig, SearchConfig,
                               TrainConfig)
  from muax_tpu.envs import AutoResetWrapper, CartPole
  from muax_tpu.models import muzero_optimizer
  from muax_tpu.models.acme_networks import make_fc_resnet_networks
  from muax_tpu.replay.buffer import replay_add, replay_init, replay_sample
  from muax_tpu.train.actor import make_rollout_fn
  from muax_tpu.train.learner import TrainState, make_multi_update_fn

  updates = max(1, math.ceil(SPI * NUM_ENVS * COLLECT / BATCH))
  env = AutoResetWrapper(CartPole())
  networks = make_fc_resnet_networks(num_actions=2, embedding_dim=256,
                                     num_bins=601, num_blocks=10)
  config = MuZeroConfig(
      search=SearchConfig(policy="muzero", num_simulations=SIMS,
                          batch_tile=TILE),
      replay=ReplayConfig(capacity=2048, min_fill=64),
      train=TrainConfig(num_envs=NUM_ENVS, collect_steps=COLLECT,
                        batch_size=BATCH, updates_per_iteration=updates,
                        unroll_steps=5, n_bootstrap=10,
                        presample_updates=16))
  import dataclasses
  optimizer = muzero_optimizer()
  rollout = make_rollout_fn(networks, env, config)
  multi_update = make_multi_update_fn(networks, optimizer, config)
  # Baseline arm: XLA replay_sample path (no fused sampler) — what the
  # hybrid mode buys this family.
  config_xla = dataclasses.replace(
      config, train=dataclasses.replace(config.train, fused_sampler=False))
  multi_update_xla = make_multi_update_fn(networks, optimizer, config_xla)

  rng = jax.random.PRNGKey(0)
  rng, init_rng, env_rng = jax.random.split(rng, 3)
  obs_shape = env.spec.observation_shape
  params = networks.init_params(init_rng, jnp.zeros((1,) + obs_shape))
  ts = TrainState(params=params, opt_state=optimizer.init(params),
                  step=jnp.asarray(0, jnp.int32))
  env_carry = env.reset(env_rng, NUM_ENVS)
  rs = replay_init(2048, COLLECT, obs_shape, 2)

  results = {"updates_per_iteration": updates, "num_simulations": SIMS,
             "num_envs": NUM_ENVS, "batch": BATCH,
             "device": str(jax.devices()[0])}

  @jax.jit
  def roll_only(ts, rs, carry, rng):
    carry, segments, priorities, m = rollout(ts.params, carry, rng,
                                             ts.params.temperature)
    rs = replay_add(rs, segments, priorities)
    return rs, carry, m

  print("[p] compiling rollout_only", file=sys.stderr, flush=True)
  for _ in range(2):
    rng, r = jax.random.split(rng)
    rs, env_carry, m = roll_only(ts, rs, env_carry, r)
    sync(m["mean_episode_return"])

  def block_roll():
    nonlocal rs, env_carry, rng
    for _ in range(2):
      rng, r = jax.random.split(rng)
      rs, env_carry, m = roll_only(ts, rs, env_carry, r)
    sync(m["mean_episode_return"])

  results["rollout_only_ms"] = round(best_of(block_roll) / 2 * 1e3, 1)
  print("rollout_only_ms", results["rollout_only_ms"], flush=True)

  @jax.jit
  def learner_only(ts, rs, rng):
    ts2, _, metrics = multi_update(ts, rs, rng)
    return ts2, metrics

  print("[p] compiling multi_update", file=sys.stderr, flush=True)
  rng, r = jax.random.split(rng)
  ts2, metrics = learner_only(ts, rs, r)
  sync(metrics["loss"])

  def block_learn():
    nonlocal rng
    for _ in range(2):
      rng, r = jax.random.split(rng)
      ts2, metrics = learner_only(ts, rs, r)
    sync(metrics["loss"])

  results["multi_update_ms"] = round(best_of(block_learn) / 2 * 1e3, 1)
  print("multi_update_ms", results["multi_update_ms"], flush=True)

  @jax.jit
  def learner_only_xla(ts, rs, rng):
    ts2, _, metrics = multi_update_xla(ts, rs, rng)
    return ts2, metrics

  print("[p] compiling multi_update_xla", file=sys.stderr, flush=True)
  rng, r = jax.random.split(rng)
  ts2, metrics = learner_only_xla(ts, rs, r)
  sync(metrics["loss"])

  def block_learn_xla():
    nonlocal rng
    for _ in range(2):
      rng, r = jax.random.split(rng)
      ts2, metrics = learner_only_xla(ts, rs, r)
    sync(metrics["loss"])

  results["multi_update_xla_sampler_ms"] = round(
      best_of(block_learn_xla) / 2 * 1e3, 1)
  print("multi_update_xla_sampler_ms",
        results["multi_update_xla_sampler_ms"], flush=True)

  # Fixed-batch grad+opt scan: isolates sampling/gather/prep from compute.
  rng, r = jax.random.split(rng)
  batch, _, _ = replay_sample(rs, r, BATCH, 5)
  import optax

  from muax_tpu.models.losses import muzero_loss

  @jax.jit
  def grad_opt_scan(ts):
    def body(ts, _):
      grads, metrics = jax.grad(
          lambda p: muzero_loss(p, batch, networks),
          has_aux=True)(ts.params)
      updates_, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
      new_params = optax.apply_updates(ts.params, updates_)
      new_params = new_params._replace(temperature=ts.params.temperature)
      return TrainState(new_params, opt_state, ts.step + 1), metrics.total
    ts, losses = jax.lax.scan(body, ts, None, length=updates)
    return losses[-1]

  print("[p] compiling grad_opt_scan", file=sys.stderr, flush=True)
  sync(grad_opt_scan(ts))
  results["grad_opt_scan_ms"] = round(
      best_of(lambda: sync(grad_opt_scan(ts))) * 1e3, 1)
  print("grad_opt_scan_ms", results["grad_opt_scan_ms"], flush=True)

  # Achieved learner FLOP/s: XLA cost analysis over the fixed-batch scan.
  compiled = jax.jit(grad_opt_scan).lower(ts).compile()
  try:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
      ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    if flops:
      results["grad_flops_per_update"] = round(flops / updates, 1)
      results["grad_tflops_per_s"] = round(
          flops / (results["grad_opt_scan_ms"] / 1e3) / 1e12, 2)
  except Exception:
    pass

  group = math.gcd(updates, 16)
  num_groups = updates // group

  @jax.jit
  def sample_scan(rs, rng):
    def body(c, r):
      b, seg, st = replay_sample(rs, r, group * BATCH, 5)
      return c + jnp.sum(b.obs[:, 0, 0]) + jnp.sum(seg), ()
    c, _ = jax.lax.scan(body, jnp.float32(0),
                        jax.random.split(rng, num_groups))
    return c

  print("[p] compiling sample_scan", file=sys.stderr, flush=True)
  rng, r = jax.random.split(rng)
  sync(sample_scan(rs, r))
  results["sample_only_ms"] = round(
      best_of(lambda: sync(sample_scan(rs, r))) * 1e3, 1)
  print("sample_only_ms", results["sample_only_ms"], flush=True)

  results["derived"] = {
      "glue_ms": round(results["multi_update_ms"]
                       - results["grad_opt_scan_ms"]
                       - results["sample_only_ms"], 1),
      "grad_opt_ms_per_update": round(
          results["grad_opt_scan_ms"] / updates, 3),
      "group": group, "num_groups": num_groups,
      "iteration_ms_est": round(results["rollout_only_ms"]
                                + results["multi_update_ms"], 1),
      "env_steps_per_s_est": round(
          NUM_ENVS * COLLECT / (results["rollout_only_ms"]
                                + results["multi_update_ms"]) * 1e3, 1),
  }
  print(json.dumps(results, indent=1), flush=True)
  with open("/root/repo/scripts/profile_fc_resnet_training_out.json",
            "w") as f:
    json.dump(results, f, indent=1)


if __name__ == "__main__":
  main()
