"""Go-scale AZ resnet throughput (VERDICT r2 next #5, chip half).

The reference's tensor-parallel workload is the AlphaZero Go net — 19
residual blocks x 256 filters on 19x19x17 planes, manually device_map'd
over GPUs (examples/open_spiel/go/run_alphazero.py:129-273). This script
measures, on the current backend:

  * replicated apply throughput (positions/s, achieved FLOP/s, MFU) over a
    batch sweep — the single-chip baseline any multi-chip sharding must
    beat, and
  * with >= 2 devices (e.g. the virtual CPU mesh), the (data, model)
    channel-sharded apply from parallel/model_parallel.py on the same net,
    for a direct sharded-vs-replicated comparison.

Writes BENCH_GO_r03.json when --out is given.

  python scripts/bench_go_resnet.py --batches 64,256,1024
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def resnet_flops(batch, h=19, w=19, channels=256, blocks=19, in_planes=17,
                 num_actions=362):
  """Analytic forward FLOPs (2 * MACs) of make_az_resnet at Go scale."""
  pos = h * w
  stem = 2 * pos * 9 * in_planes * channels
  body = blocks * 2 * (2 * pos * 9 * channels * channels)
  flat = pos * channels
  heads = 2 * flat * num_actions + 2 * flat * 64 + 2 * 64
  return batch * (stem + body + heads)


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--batches", type=str, default="64,256,1024")
  p.add_argument("--iters", type=int, default=10)
  p.add_argument("--out", type=str, default=None)
  args = p.parse_args()

  from muax_tpu.models.az_networks import make_az_resnet
  from muax_tpu.parallel import (make_mesh, make_model_parallel_apply,
                                 shard_az_params, sharded_fraction)
  from muax_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

  network = make_az_resnet(362, channels=256, num_blocks=19)
  params = network.init_params(jax.random.PRNGKey(0),
                               jnp.zeros((1, 19, 19, 17)))
  dev = jax.devices()[0]
  n_dev = len(jax.devices())
  results = {"device": str(dev), "num_devices": n_dev,
             "net": "az_resnet 19x256 (Go scale, run_alphazero.py:129-273)",
             "replicated": {}, "sharded": {}}

  @jax.jit
  def apply(params, obs):
    return network.apply(params, obs)

  for b in [int(x) for x in args.batches.split(",")]:
    obs = jax.random.normal(jax.random.PRNGKey(1), (b, 19, 19, 17))
    logits, value = apply(params, obs)
    float(value[0])
    t0 = time.time()
    for _ in range(args.iters):
      logits, value = apply(params, obs)
      float(value[0])
    dt = (time.time() - t0) / args.iters
    fl = resnet_flops(b)
    results["replicated"][str(b)] = {
        "positions_per_s": round(b / dt, 1),
        "ms_per_batch": round(dt * 1e3, 2),
        "flops_per_s": round(fl / dt, 1),
        "mfu_vs_bf16_197tf": round(fl / dt / 197e12, 4),
    }
    print(f"replicated b={b}: {b/dt:,.0f} pos/s  "
          f"{fl/dt/1e12:.2f} TFLOP/s", flush=True)

  if n_dev >= 2:
    model_size = 4 if n_dev % 4 == 0 else 2
    mesh = make_mesh((n_dev // model_size, model_size),
                     axis_names=(DATA_AXIS, MODEL_AXIS))
    sharded = shard_az_params(params.network, mesh)
    frac = sharded_fraction(params.network, mesh)
    mp_apply = make_model_parallel_apply(network.network, mesh)
    b = 64
    obs = jax.random.normal(jax.random.PRNGKey(1), (b, 19, 19, 17))
    logits, value = mp_apply(sharded, obs)
    float(value[0])
    t0 = time.time()
    for _ in range(max(2, args.iters // 2)):
      logits, value = mp_apply(sharded, obs)
      float(value[0])
    dt = (time.time() - t0) / max(2, args.iters // 2)
    results["sharded"] = {
        "mesh": f"(data={n_dev // model_size}, model={model_size})",
        "sharded_fraction": round(frac, 4),
        "batch": b,
        "positions_per_s": round(b / dt, 1),
        "ms_per_batch": round(dt * 1e3, 2),
    }
    print(f"sharded {results['sharded']['mesh']} frac={frac:.3f} "
          f"b={b}: {b/dt:,.0f} pos/s", flush=True)

  if args.out:
    with open(args.out, "w") as f:
      json.dump(results, f, indent=1)
  print(json.dumps({k: v for k, v in results.items() if k != "sharded"
                    or v}))


if __name__ == "__main__":
  main()
