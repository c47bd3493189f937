"""Capture a device trace of one rollout dispatch and dump per-op times.

Parses the xplane proto with tensorflow's bundled protobuf — shows where
the per-env-step milliseconds actually go inside the jitted rollout.
Builder tool.
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if os.environ.get("JAX_CACHE_DIR"):
  jax.config.update("jax_compilation_cache_dir", os.environ["JAX_CACHE_DIR"])  # opt-in: cache writes hang over the axon tunnel


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--num_envs", type=int, default=1024)
  p.add_argument("--num_simulations", type=int, default=64)
  p.add_argument("--collect_steps", type=int, default=20)
  p.add_argument("--logdir", default="/tmp/muax_trace")
  p.add_argument("--top", type=int, default=40)
  args = p.parse_args()

  from muax_tpu.config import (MuZeroConfig, ReplayConfig, SearchConfig,
                               TrainConfig)
  from muax_tpu.envs import AutoResetWrapper, CartPole
  from muax_tpu.models import make_mlp_networks
  from muax_tpu.train.actor import make_rollout_fn

  B = args.num_envs
  config = MuZeroConfig(
      search=SearchConfig(num_simulations=args.num_simulations),
      replay=ReplayConfig(capacity=2048, min_fill=64),
      train=TrainConfig(num_envs=B, collect_steps=args.collect_steps,
                        batch_size=512, updates_per_iteration=8,
                        unroll_steps=5, n_bootstrap=10))
  networks = make_mlp_networks(num_actions=2, embedding_dim=8,
                               support_size=20)
  env = AutoResetWrapper(CartPole())
  rollout = jax.jit(make_rollout_fn(networks, env, config))

  rng = jax.random.PRNGKey(0)
  params = networks.init_params(rng, jnp.zeros((1, 4)))
  carry = env.reset(jax.random.PRNGKey(1), B)
  out = rollout(params, carry, rng, jnp.asarray(1.0, jnp.float32))
  jax.block_until_ready(out)

  os.system(f"rm -rf {args.logdir}")
  with jax.profiler.trace(args.logdir):
    for _ in range(3):
      out = rollout(params, carry, rng, jnp.asarray(1.0, jnp.float32))
      jax.block_until_ready(out)

  # ---- parse xplane ----
  from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402
  paths = glob.glob(os.path.join(args.logdir, "**", "*.xplane.pb"),
                    recursive=True)
  print("xplane files:", paths)
  totals = collections.Counter()
  counts = collections.Counter()
  for path in paths:
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
      xs.ParseFromString(f.read())
    for plane in xs.planes:
      if "TPU" not in plane.name and "Device" not in plane.name:
        continue
      print("plane:", plane.name)
      ev_names = plane.event_metadata
      for line in plane.lines:
        for ev in line.events:
          meta = ev_names[ev.metadata_id]
          dur_us = ev.duration_ps / 1e6
          totals[meta.name] += dur_us
          counts[meta.name] += 1
  print(f"{'op':70s} {'total_us':>12s} {'count':>8s}")
  for name, us in totals.most_common(args.top):
    print(f"{name[:70]:70s} {us:12.1f} {counts[name]:8d}")


if __name__ == "__main__":
  main()
