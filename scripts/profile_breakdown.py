"""Perf breakdown: where does the iteration time go?

Times (on the real chip) the fused search kernel alone, the root inference,
the full rollout scan, and the learner multi-update — at several batch
sizes/tiles — so kernel-level optimization work is aimed at the real
bottleneck. Not part of the library; a builder tool.
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if os.environ.get("JAX_CACHE_DIR"):
  jax.config.update("jax_compilation_cache_dir", os.environ["JAX_CACHE_DIR"])  # opt-in: cache writes hang over the axon tunnel


def timeit(fn, *args, iters=10, warmup=2):
  for _ in range(warmup):
    out = fn(*args)
  jax.block_until_ready(out)
  times = []
  for _ in range(iters):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    times.append(time.time() - t0)
  times.sort()
  return times[len(times) // 2]


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--num_envs", type=int, default=1024)
  p.add_argument("--num_simulations", type=int, default=64)
  p.add_argument("--collect_steps", type=int, default=20)
  p.add_argument("--batch_size", type=int, default=512)
  p.add_argument("--updates", type=int, default=8)
  p.add_argument("--tile", type=int, default=0)
  args = p.parse_args()

  from muax_tpu.config import (MuZeroConfig, ReplayConfig, SearchConfig,
                               TrainConfig)
  from muax_tpu.envs import AutoResetWrapper, CartPole
  from muax_tpu.models import make_mlp_networks, muzero_optimizer
  from muax_tpu.replay.buffer import replay_add, replay_init
  from muax_tpu.search.fused import extract_fused_weights, fused_muzero_search
  from muax_tpu.train.actor import make_rollout_fn
  from muax_tpu.train.inference import make_root_fn
  from muax_tpu.train.learner import TrainState, make_multi_update_fn

  B = args.num_envs
  config = MuZeroConfig(
      search=SearchConfig(num_simulations=args.num_simulations),
      replay=ReplayConfig(capacity=2048, min_fill=64),
      train=TrainConfig(num_envs=B, collect_steps=args.collect_steps,
                        batch_size=args.batch_size,
                        updates_per_iteration=args.updates,
                        unroll_steps=5, n_bootstrap=10))
  networks = make_mlp_networks(num_actions=2, embedding_dim=8,
                               support_size=20)
  env = AutoResetWrapper(CartPole())
  optimizer = muzero_optimizer()

  rng = jax.random.PRNGKey(0)
  rng, init_rng, env_rng = jax.random.split(rng, 3)
  params = networks.init_params(init_rng, jnp.zeros((1, 4)))
  train_state = TrainState(params=params, opt_state=optimizer.init(params),
                           step=jnp.asarray(0, jnp.int32))
  env_carry = env.reset(env_rng, B)
  obs = env_carry.obs

  # 1. Root inference alone.
  root_fn = jax.jit(make_root_fn(networks))
  t_root = timeit(root_fn, params, obs)
  print(f"root_inference  B={B}: {t_root*1e3:8.3f} ms")

  # 2. Fused kernel alone (one search over the batch).
  weights = extract_fused_weights(networks, params)
  root = root_fn(params, obs)

  @jax.jit
  def search_only(emb, logits, value):
    return fused_muzero_search(
        emb, logits, value, weights,
        num_simulations=args.num_simulations,
        support_size=networks.support_size, discount=0.997,
        batch_tile=args.tile or None)

  t_search = timeit(search_only, root.embedding, root.prior_logits,
                    root.value)
  print(f"fused_search    B={B}: {t_search*1e3:8.3f} ms "
        f"({t_search/B*1e6:.2f} us/env-step)")

  # 3. Full rollout scan.
  rollout = jax.jit(make_rollout_fn(networks, env, config))
  t_roll = timeit(rollout, params, env_carry, rng,
                  jnp.asarray(1.0, jnp.float32))
  per_step = t_roll / args.collect_steps
  print(f"rollout({args.collect_steps})     B={B}: {t_roll*1e3:8.3f} ms "
        f"({per_step*1e3:.3f} ms/env-step, search share "
        f"{t_search/per_step*100:.0f}%)")

  # 4. Learner multi-update alone.
  replay_state = replay_init(config.replay.capacity, args.collect_steps,
                             (4,), 2)
  _, segments, priorities, _ = rollout(params, env_carry, rng,
                                       jnp.asarray(1.0, jnp.float32))
  replay_state = replay_add(replay_state, segments, priorities)
  multi_update = jax.jit(make_multi_update_fn(networks, optimizer, config))
  t_learn = timeit(multi_update, train_state, replay_state, rng)
  print(f"multi_update({args.updates}) : {t_learn*1e3:8.3f} ms")

  total = t_roll + t_learn
  print(f"rollout+learner: {total*1e3:8.3f} ms -> "
        f"{B*args.collect_steps/total:,.0f} env-steps/s")


if __name__ == "__main__":
  main()
