"""Decompose the training-regime iteration cost on the current backend.

The r3 bench reported 47k env-steps/s at SPI=32 (VERDICT r4 item #1); this
script breaks one iteration (1024 envs x 20 steps, 160 updates of batch
4096) into its parts so the optimization target is measured, not guessed:

  rollout_only    rollout + replay_add, learner disabled
  full_iteration  rollout + replay_add + multi_update (the bench program)
  multi_update    the learner alone on a frozen replay state
  grad_opt_scan   160 x (fused grad + optimizer) on ONE fixed batch
                  (no sampling, no per-update gather/prep)
  grad_only_scan  160 x fused grad alone (no optimizer)
  opt_only_scan   160 x optimizer alone on fixed grads
  sample_only     10 x replay_sample of group*B windows (the group cadence)

Timing per tpu-tunnel methodology: one scalar readback per block,
best-of-3 blocks.
"""
from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from muax_tpu.config import MuZeroConfig, ReplayConfig, SearchConfig, TrainConfig
from muax_tpu.models import make_mlp_networks, muzero_optimizer
from muax_tpu.replay.buffer import replay_add, replay_init, replay_sample
from muax_tpu.train.actor import make_rollout_fn
from muax_tpu.train.learner import TrainState, make_multi_update_fn

NUM_ENVS = 1024
COLLECT = 20
SIMS = 64
BATCH = 4096
SPI = 32.0
PRESAMPLE = 16


def sync(x):
  return float(jnp.asarray(x).reshape(-1)[0])


def best_of(f, blocks=3):
  ts = []
  for _ in range(blocks):
    t0 = time.time()
    f()
    ts.append(time.time() - t0)
  return min(ts)


def main():
  updates = max(1, math.ceil(SPI * NUM_ENVS * COLLECT / BATCH))
  from muax_tpu.envs import AutoResetWrapper, CartPole
  env = AutoResetWrapper(CartPole())
  networks = make_mlp_networks(num_actions=2, embedding_dim=8,
                               support_size=20)
  config = MuZeroConfig(
      search=SearchConfig(policy="muzero", num_simulations=SIMS,
                          batch_tile=512),
      replay=ReplayConfig(capacity=2048, min_fill=64),
      train=TrainConfig(num_envs=NUM_ENVS, collect_steps=COLLECT,
                        batch_size=BATCH, updates_per_iteration=updates,
                        unroll_steps=5, n_bootstrap=10,
                        presample_updates=PRESAMPLE))
  optimizer = muzero_optimizer()
  rollout = make_rollout_fn(networks, env, config)
  multi_update = make_multi_update_fn(networks, optimizer, config)

  rng = jax.random.PRNGKey(0)
  rng, init_rng, env_rng = jax.random.split(rng, 3)
  params = networks.init_params(init_rng, jnp.zeros((1, 4)))
  ts = TrainState(params=params, opt_state=optimizer.init(params),
                  step=jnp.asarray(0, jnp.int32))
  env_carry = env.reset(env_rng, NUM_ENVS)
  rs = replay_init(2048, COLLECT, (4,), 2)

  results = {"updates_per_iteration": updates,
             "device": str(jax.devices()[0])}

  @jax.jit
  def roll_only(ts, rs, carry, rng):
    r1, _ = jax.random.split(rng)
    carry, segments, priorities, m = rollout(ts.params, carry, r1,
                                             ts.params.temperature)
    rs = replay_add(rs, segments, priorities)
    return rs, carry, m

  print("[profile] compiling rollout_only...", file=sys.stderr, flush=True)
  for _ in range(2):  # warm + fill replay
    rng, r = jax.random.split(rng)
    rs, env_carry, m = roll_only(ts, rs, env_carry, r)
    sync(m["mean_episode_return"])

  def block_roll():
    nonlocal rs, env_carry, rng
    for _ in range(5):
      rng, r = jax.random.split(rng)
      rs, env_carry, m = roll_only(ts, rs, env_carry, r)
    sync(m["mean_episode_return"])

  results["rollout_only_ms"] = round(best_of(block_roll) / 5 * 1e3, 2)
  print("rollout_only_ms", results["rollout_only_ms"], flush=True)

  # --- full iteration (bench program) ---
  @jax.jit
  def full_it(ts, rs, carry, rng):
    r1, r2 = jax.random.split(rng)
    carry, segments, priorities, _ = rollout(ts.params, carry, r1,
                                             ts.params.temperature)
    rs = replay_add(rs, segments, priorities)
    ts, rs, metrics = multi_update(ts, rs, r2)
    return ts, rs, carry, metrics

  print("[profile] compiling full_iteration...", file=sys.stderr, flush=True)
  rng, r = jax.random.split(rng)
  ts, rs, env_carry, metrics = full_it(ts, rs, env_carry, r)
  sync(metrics["loss"])

  def block_full():
    nonlocal ts, rs, env_carry, rng
    for _ in range(3):
      rng, r = jax.random.split(rng)
      ts, rs, env_carry, metrics = full_it(ts, rs, env_carry, r)
    sync(metrics["loss"])

  results["full_iteration_ms"] = round(best_of(block_full) / 3 * 1e3, 2)
  print("full_iteration_ms", results["full_iteration_ms"], flush=True)

  # --- learner alone on frozen replay ---
  @jax.jit
  def learner_only(ts, rs, rng):
    ts2, _, metrics = multi_update(ts, rs, rng)
    return ts2, metrics

  print("[profile] compiling multi_update...", file=sys.stderr, flush=True)
  rng, r = jax.random.split(rng)
  ts2, metrics = learner_only(ts, rs, r)
  sync(metrics["loss"])

  def block_learn():
    nonlocal rng
    for _ in range(3):
      rng, r = jax.random.split(rng)
      ts2, metrics = learner_only(ts, rs, r)
    sync(metrics["loss"])

  results["multi_update_ms"] = round(best_of(block_learn) / 3 * 1e3, 2)
  print("multi_update_ms", results["multi_update_ms"], flush=True)

  # --- fixed-batch grad+opt scan (no sampling/gather) ---
  rng, r = jax.random.split(rng)
  batch, _, _ = replay_sample(rs, r, BATCH, 5)

  from muax_tpu.models.fused_learner import (extract_learner_weights,
                                             fused_muzero_grad)
  import optax

  lw = extract_learner_weights(networks, params)
  use_fused = lw is not None and jax.default_backend() != "cpu"
  results["fused_kernel"] = bool(use_fused)

  def one_grad(p):
    if use_fused:
      return fused_muzero_grad(p, batch, networks,
                               extract_learner_weights(networks, p))
    from muax_tpu.models.losses import muzero_loss
    return jax.grad(lambda q: muzero_loss(q, batch, networks),
                    has_aux=True)(p)

  @jax.jit
  def grad_opt_scan(ts):
    def body(ts, _):
      grads, metrics = one_grad(ts.params)
      updates_, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
      new_params = optax.apply_updates(ts.params, updates_)
      new_params = new_params._replace(temperature=ts.params.temperature)
      return TrainState(new_params, opt_state, ts.step + 1), metrics.total
    ts, losses = jax.lax.scan(body, ts, None, length=updates)
    return ts, losses[-1]

  print("[profile] compiling grad_opt_scan...", file=sys.stderr, flush=True)
  _, l = grad_opt_scan(ts)
  sync(l)
  results["grad_opt_scan_ms"] = round(
      best_of(lambda: sync(grad_opt_scan(ts)[1])) * 1e3, 2)
  print("grad_opt_scan_ms", results["grad_opt_scan_ms"], flush=True)

  # --- grad only ---
  @jax.jit
  def grad_scan(p):
    def body(c, _):
      grads, metrics = one_grad(p)
      leaf = jax.tree.leaves(grads)[0]
      return c + jnp.sum(leaf), metrics.total
    c, losses = jax.lax.scan(body, jnp.float32(0), None, length=updates)
    return c + losses[-1]

  print("[profile] compiling grad_scan...", file=sys.stderr, flush=True)
  sync(grad_scan(params))
  results["grad_only_scan_ms"] = round(
      best_of(lambda: sync(grad_scan(params))) * 1e3, 2)
  print("grad_only_scan_ms", results["grad_only_scan_ms"], flush=True)

  # --- optimizer only ---
  fixed_grads = jax.tree.map(jnp.ones_like, params)

  @jax.jit
  def opt_scan(ts):
    def body(ts, _):
      updates_, opt_state = optimizer.update(fixed_grads, ts.opt_state,
                                             ts.params)
      new_params = optax.apply_updates(ts.params, updates_)
      return TrainState(new_params, opt_state, ts.step + 1), ()
    ts, _ = jax.lax.scan(body, ts, None, length=updates)
    return ts

  print("[profile] compiling opt_scan...", file=sys.stderr, flush=True)
  o = opt_scan(ts)
  sync(o.params.temperature)
  results["opt_only_scan_ms"] = round(
      best_of(lambda: sync(opt_scan(ts).params.temperature)) * 1e3, 2)
  print("opt_only_scan_ms", results["opt_only_scan_ms"], flush=True)

  # --- sampling only, group cadence ---
  group = math.gcd(updates, PRESAMPLE)
  num_groups = updates // group

  @jax.jit
  def sample_scan(rs, rng):
    def body(c, r):
      b, seg, st = replay_sample(rs, r, group * BATCH, 5)
      return c + jnp.sum(b.reward[:, 0]) + jnp.sum(seg + st), ()
    c, _ = jax.lax.scan(body, jnp.float32(0),
                        jax.random.split(rng, num_groups))
    return c

  print("[profile] compiling sample_scan...", file=sys.stderr, flush=True)
  rng, r = jax.random.split(rng)
  sync(sample_scan(rs, r))
  results["sample_only_ms"] = round(
      best_of(lambda: sync(sample_scan(rs, r))) * 1e3, 2)
  print("sample_only_ms", results["sample_only_ms"], flush=True)

  results["group"] = group
  results["num_groups"] = num_groups
  per_upd = results["grad_opt_scan_ms"] / updates
  results["derived"] = {
      "learner_glue_ms": round(results["multi_update_ms"]
                               - results["grad_opt_scan_ms"]
                               - results["sample_only_ms"], 2),
      "grad_ms_per_update": round(results["grad_only_scan_ms"] / updates, 3),
      "opt_ms_per_update": round(results["opt_only_scan_ms"] / updates, 3),
      "grad_opt_ms_per_update": round(per_upd, 3),
      "env_steps_per_s_now": round(
          NUM_ENVS * COLLECT / (results["full_iteration_ms"] / 1e3), 1),
  }
  print(json.dumps(results, indent=1), flush=True)
  with open("/root/repo/scripts/profile_learner_out.json", "w") as f:
    json.dump(results, f, indent=1)


if __name__ == "__main__":
  main()
