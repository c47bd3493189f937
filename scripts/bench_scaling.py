"""Scaling-efficiency harness: the SPMD training step at 1..N devices.

BASELINE.md north star: ">= 80% scaling efficiency from 1 host to N>=2
hosts". This harness runs `make_sharded_program`'s full iteration (rollout
+ search + replay + learner with psum over the data axis) at increasing
mesh sizes with PER-DEVICE work held constant (weak scaling) and reports
env-steps/s and parallel efficiency vs the 1-device run.

On real multi-chip hardware, run it as-is (devices = the pod's chips; add
`jax.distributed.initialize` via parallel.multihost for multi-host). This
image has ONE physical TPU chip, so the committed numbers
(`BENCH_SCALING_r03.json`) come from the virtual CPU mesh
(--xla_force_host_platform_device_count). Virtual devices share one
host's CPU cores, so weak-scaling wall clock CANNOT stay flat there —
N devices run ~N x the total work on the same silicon. The meaningful
virtual-mesh number is `speedup_vs_serial_bound` (how much faster than
running the N shards back-to-back, i.e. how much parallelism +
program-overhead headroom the SPMD structure exposes); `efficiency_vs_1dev`
only becomes the north-star >= 80% metric on real multi-chip hardware.

  python scripts/bench_scaling.py --devices 1,2,4,8 --envs_per_device 256
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force the virtual CPU mesh unless the caller asks for the real backend
# (env JAX_PLATFORMS is pre-set to the TPU in this image, so setdefault is
# not enough — mirror tests/conftest.py).
_REAL = "--real" in sys.argv
if not _REAL:
  os.environ["JAX_PLATFORMS"] = "cpu"
  flags = os.environ.get("XLA_FLAGS", "")
  if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if not _REAL:
  jax.config.update("jax_platform_name", "cpu")


def bench_mesh(n_devices: int, envs_per_device: int, sims: int,
               iters: int) -> dict:
  from muax_tpu.config import (MuZeroConfig, ReplayConfig, SearchConfig,
                               TrainConfig)
  from muax_tpu.envs import AutoResetWrapper, CartPole
  from muax_tpu.models import create_optimizer, make_mlp_networks
  from muax_tpu.parallel import make_mesh, make_sharded_program

  devices = jax.devices()[:n_devices]
  mesh = make_mesh(devices=devices)
  num_envs = envs_per_device * n_devices
  config = MuZeroConfig(
      search=SearchConfig(num_simulations=sims),
      replay=ReplayConfig(capacity=64 * n_devices, min_fill=n_devices),
      train=TrainConfig(num_envs=num_envs, collect_steps=10,
                        batch_size=64 * n_devices, updates_per_iteration=2,
                        unroll_steps=3, n_bootstrap=5))
  networks = make_mlp_networks(2, embedding_dim=8, support_size=10)
  program = make_sharded_program(
      networks, AutoResetWrapper(CartPole()), config,
      create_optimizer("adam", 1e-3), mesh)
  ts, rs, ec = program.init(jax.random.PRNGKey(0))
  ts, rs, ec, m = program.iteration(ts, rs, ec, jax.random.PRNGKey(1))
  float(m["loss"])

  best = 1e9
  rng = jax.random.PRNGKey(2)
  for _ in range(3):
    t0 = time.time()
    for i in range(iters):
      rng, k = jax.random.split(rng)
      ts, rs, ec, m = program.iteration(ts, rs, ec, k)
      float(m["loss"])
    best = min(best, (time.time() - t0) / iters)
  steps = num_envs * config.train.collect_steps
  return {"devices": n_devices, "num_envs": num_envs,
          "env_steps_per_s": round(steps / best, 1),
          "iteration_ms": round(best * 1e3, 1)}


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--devices", type=str, default="1,2,4,8")
  p.add_argument("--envs_per_device", type=int, default=256)
  p.add_argument("--num_simulations", type=int, default=16)
  p.add_argument("--iters", type=int, default=5)
  p.add_argument("--out", type=str, default=None)
  p.add_argument("--real", action="store_true",
                 help="use the real backend (TPU pod) instead of the "
                      "virtual CPU mesh")
  args = p.parse_args()

  rows = []
  for n in [int(x) for x in args.devices.split(",")]:
    if n > len(jax.devices()):
      print(f"skipping {n} devices (only {len(jax.devices())} available)")
      continue
    row = bench_mesh(n, args.envs_per_device, args.num_simulations,
                     args.iters)
    if rows:
      base = rows[0]
      # Weak scaling: perfect = per-device throughput stays flat (real
      # chips); on the shared-core virtual mesh see speedup_vs_serial_bound.
      row["efficiency_vs_1dev"] = round(
          (row["env_steps_per_s"] / row["devices"])
          / (base["env_steps_per_s"] / base["devices"]), 3)
      row["speedup_vs_serial_bound"] = round(
          base["iteration_ms"] * row["devices"] / row["iteration_ms"], 2)
    print(json.dumps(row), flush=True)
    rows.append(row)

  out = {"backend": jax.default_backend(),
         "device0": str(jax.devices()[0]),
         "mode": "weak scaling (constant envs/device)",
         "rows": rows}
  if args.out:
    with open(args.out, "w") as f:
      json.dump(out, f, indent=1)


if __name__ == "__main__":
  main()
