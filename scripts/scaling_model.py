"""Extract per-iteration collective traffic from the COMPILED sharded
programs (virtual 8-device CPU mesh) for the analytical multi-chip scaling
model (SCALING_MODEL.md, VERDICT r4 item #6).

Outputs scripts/scaling_model_out.json with, per program:
  * every all-reduce / all-gather / reduce-scatter / collective-permute in
    the optimized HLO, with shapes and bytes,
  * total collective bytes and op count per iteration,
  * the compute-side totals (XLA flop estimate) for the roofline side.

Run under: XLA_FLAGS=--xla_force_host_platform_device_count=8 (conftest
pattern); forces the CPU backend explicitly.
"""
import json
import re
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platform_name", "cpu")

import jax.numpy as jnp
import numpy as np

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
               "f64": 8, "s8": 1, "u8": 1, "s64": 8, "u64": 8}

_COLL_RE = re.compile(
    r"(\w+)\[([\d,]*)\][^=]*\b"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start)?\(")


def parse_collectives(hlo_text: str):
  rows = []
  for line in hlo_text.splitlines():
    m = _COLL_RE.search(line)
    if not m or "-done" in line:
      continue
    dtype, dims, kind = m.group(1), m.group(2), m.group(3)
    if dtype not in DTYPE_BYTES:
      continue
    shape = [int(d) for d in dims.split(",") if d] or [1]
    nbytes = int(np.prod(shape)) * DTYPE_BYTES[dtype]
    rows.append({"kind": kind, "dtype": dtype, "shape": shape,
                 "bytes": nbytes})
  return rows


def summarize(rows):
  by_kind = {}
  for r in rows:
    k = by_kind.setdefault(r["kind"], {"count": 0, "bytes": 0})
    k["count"] += 1
    k["bytes"] += r["bytes"]
  return {"ops": rows, "by_kind": by_kind,
          "total_bytes": sum(r["bytes"] for r in rows),
          "total_count": len(rows)}


def flops_of(compiled):
  try:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
      ca = ca[0]
    return float(ca.get("flops", 0.0))
  except Exception:
    return None


def flagship_dp():
  """The flagship training iteration (rollout + SPI-density learner),
  data-parallel over 8 devices — the program bench.py's training_regime
  runs, sharded by parallel/sharded.py."""
  from jax.sharding import Mesh
  from muax_tpu.config import (MuZeroConfig, ReplayConfig, SearchConfig,
                               TrainConfig)
  from muax_tpu.envs import AutoResetWrapper, CartPole
  from muax_tpu.models import make_mlp_networks, muzero_optimizer
  from muax_tpu.parallel.sharded import make_sharded_program

  devices = np.array(jax.devices()[:8])
  mesh = Mesh(devices.reshape(8, 1), ("data", "model"))
  networks = make_mlp_networks(num_actions=2, embedding_dim=8,
                               support_size=20)
  config = MuZeroConfig(
      search=SearchConfig(policy="muzero", num_simulations=8),
      replay=ReplayConfig(capacity=2048, min_fill=64),
      train=TrainConfig(num_envs=1024, collect_steps=20, batch_size=4096,
                        updates_per_iteration=160, unroll_steps=5,
                        presample_updates=16))
  program = make_sharded_program(networks, AutoResetWrapper(CartPole()),
                                 config, muzero_optimizer(), mesh)
  state = program.init(jax.random.PRNGKey(0))
  lowered = jax.jit(program.iteration).lower(*state,
                                             jax.random.PRNGKey(1))
  compiled = lowered.compile()
  hlo = compiled.as_text()
  out = summarize(parse_collectives(hlo))
  out["flops_per_iter"] = flops_of(compiled)
  out["param_count"] = int(sum(np.prod(x.shape) for x in
                               jax.tree.leaves(state[0].params)
                               if hasattr(x, "shape")))
  out["updates_per_iteration"] = 160
  return out


def go_scale_mp():
  """The Go-scale (19 block / 256 filter) AZ resnet apply, model-parallel
  over an 8-way model axis (tests/test_parallel.py program)."""
  from muax_tpu.models.az_networks import make_az_resnet
  from muax_tpu.parallel import (make_mesh, make_model_parallel_apply,
                                 shard_az_params)
  from muax_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

  mesh = make_mesh((2, 4), axis_names=(DATA_AXIS, MODEL_AXIS))
  network = make_az_resnet(19 * 19 + 1, channels=256, num_blocks=19)
  params = network.init_params(jax.random.PRNGKey(0),
                               jnp.zeros((1, 19, 19, 17)))
  sharded_params = shard_az_params(params.network, mesh)
  apply = make_model_parallel_apply(network.network, mesh)
  obs = jnp.zeros((64, 19, 19, 17))
  compiled = apply.lower(sharded_params, obs).compile()
  out = summarize(parse_collectives(compiled.as_text()))
  out["flops_per_apply"] = flops_of(compiled)
  out["param_count"] = int(sum(np.prod(x.shape)
                               for x in jax.tree.leaves(params.network)))
  out["batch"] = 64
  out["mesh"] = "(data=2, model=4)"
  return out


def main():
  results = {"n_devices": len(jax.devices()), "backend": "cpu-virtual"}
  print("[sm] compiling flagship DP...", file=sys.stderr, flush=True)
  results["flagship_dp_iteration"] = flagship_dp()
  f = results["flagship_dp_iteration"]
  print(f"flagship: {f['total_count']} collectives, "
        f"{f['total_bytes']} bytes/iter", flush=True)
  print("[sm] compiling go-scale MP...", file=sys.stderr, flush=True)
  try:
    results["go_mp_apply"] = go_scale_mp()
    g = results["go_mp_apply"]
    print(f"go MP: {g['total_count']} collectives, "
          f"{g['total_bytes']} bytes/apply", flush=True)
  except Exception as e:  # keep the flagship result even if MP API drifts
    results["go_mp_apply"] = {"error": repr(e)}
    print("go MP failed:", repr(e), flush=True)
  # Trim the per-op list for the JSON (keep the 20 largest).
  for key in ("flagship_dp_iteration", "go_mp_apply"):
    ops = results[key].get("ops")
    if ops:
      results[key]["ops"] = sorted(ops, key=lambda r: -r["bytes"])[:20]
  with open("/root/repo/scripts/scaling_model_out.json", "w") as fjson:
    json.dump(results, fjson, indent=1)
  print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "ops"}
                    if isinstance(v, dict) else v
                    for k, v in results.items()}, indent=1))


if __name__ == "__main__":
  main()
