"""Benchmark harness — prints ONE JSON line with the headline metric.

Default run measures TWO regimes of the flagship CartPole MLP agent and
reports both on the same line:

  * ``rollout_max`` (the headline `value`): env-steps/s/chip through the
    full training iteration at rollout-saturating settings (8192 envs,
    8 updates/iteration) — the BASELINE.md north-star metric
    (>= 100k env-steps/s/chip).
  * ``training_regime``: env-steps/s at the REFERENCE's update density —
    Reverb SampleToInsertRatio samples_per_insert=32
    (acme/jax/muzero/config.py:63-66): every inserted env step is matched
    by 32 sampled learner windows. On one chip the actor and learner
    serialize inside the same program, so this regime is learner-bound;
    the entry also reports learner windows/s (the per-chip learner
    throughput at reference density) and achieved FLOP/s from XLA's
    compiled cost analysis.

Matrix mode (``--matrix``) benches the non-flagship paths — gumbel,
categorical (acme two-hot family), EZ conv on pixels, stochastic at its
200-sim reference default, Connect-Four AlphaZero self-play — and writes
BENCH_MATRIX_r05.json (incremental + resumable; the 512-env SMZ stress
row runs LAST — see the in-matrix note).

Single mode: pass ``--policy``/``--network``/``--spi`` to bench one
configuration and print its JSON.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time


def _progress(msg: str) -> None:
  print(f"[bench] {msg}", file=sys.stderr, flush=True)

import jax
import jax.numpy as jnp

# Persistent compilation cache: OPT-IN via JAX_CACHE_DIR only. Serializing
# the fused-search executable for the cache write hangs indefinitely over the
# axon TPU tunnel (reproduced: all threads futex-wait after compile finishes),
# so the default is no cache — a clean ~45s compile, then steady state.
if os.environ.get("JAX_CACHE_DIR"):
  jax.config.update("jax_compilation_cache_dir", os.environ["JAX_CACHE_DIR"])

BASELINE_ENV_STEPS_PER_S = 100_000.0
# TPU v5e (v5 lite) peak: 197 TFLOP/s bf16 / ~98.5 TFLOP/s fp32.
PEAK_FLOPS_BF16 = 197e12


def _cost_flops(compiled):
  """XLA-reported flops per call of an AOT-compiled executable (None if the
  backend does not expose cost analysis)."""
  try:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
      ca = ca[0]
    return float(ca.get("flops", 0.0)) or None
  except Exception:
    return None


def make_networks(kind: str):
  if kind == "mlp":
    from muax_tpu.models import make_mlp_networks
    return make_mlp_networks(num_actions=2, embedding_dim=8, support_size=20)
  if kind == "categorical":
    from muax_tpu.models.acme_networks import make_categorical_mlp_networks
    return make_categorical_mlp_networks(num_actions=2, embedding_dim=64,
                                         layer_sizes=(256, 256, 256))
  if kind == "ez_conv":
    from muax_tpu.models import make_efficientzero_networks
    return make_efficientzero_networks(num_actions=3, support_size=20,
                                       channels=32, num_blocks=2)
  if kind == "smz_mlp":
    from muax_tpu.models import make_stochastic_mlp_networks
    return make_stochastic_mlp_networks(2, num_chance_outcomes=32,
                                        embedding_dim=32, support_size=20)
  if kind == "fc_resnet":
    from muax_tpu.models.acme_networks import make_fc_resnet_networks
    return make_fc_resnet_networks(num_actions=2, embedding_dim=256,
                                   num_bins=601, num_blocks=10)
  raise ValueError(kind)


def make_env(kind: str):
  from muax_tpu.envs import AutoResetWrapper, CartPole, PixelCatch
  if kind == "ez_conv":
    # uint8 frames (the reference ALE convention): the ring stores raw
    # bytes — 4x less replay gather traffic than f32 storage.
    return AutoResetWrapper(PixelCatch(rows=10, columns=5, scale=8,
                                       dtype=jnp.uint8))
  return AutoResetWrapper(CartPole())


def run_config(*, policy: str, network: str, num_envs: int,
               num_simulations: int, collect_steps: int, batch_size: int,
               updates: int, iters: int, tile, spi=None,
               presample: int = 16, seed: int = 0,
               repeats: int = 3, max_depth=None) -> dict:
  """Build the full training iteration (rollout + replay + learner) for one
  configuration and measure sustained throughput on the current backend."""
  from muax_tpu.config import (MuZeroConfig, ReplayConfig, SearchConfig,
                               TrainConfig)
  from muax_tpu.models import muzero_optimizer
  from muax_tpu.replay.buffer import replay_add, replay_init
  from muax_tpu.train.actor import make_rollout_fn
  from muax_tpu.train.learner import TrainState, make_multi_update_fn

  if spi is not None:
    # Reference update density: sampled windows = spi * inserted steps
    # (Reverb SampleToInsertRatio, acme/jax/muzero/config.py:63-66).
    updates = max(1, math.ceil(spi * num_envs * collect_steps / batch_size))

  env = make_env(network)
  networks = make_networks(network)
  obs_shape = env.spec.observation_shape
  config = MuZeroConfig(
      search=SearchConfig(policy=policy, num_simulations=num_simulations,
                          batch_tile=tile or None, max_depth=max_depth),
      # Ring holds at least one full rollout without wrapping a single add.
      replay=ReplayConfig(capacity=max(2048, 2 * num_envs), min_fill=64),
      train=TrainConfig(num_envs=num_envs, collect_steps=collect_steps,
                        batch_size=batch_size,
                        updates_per_iteration=updates,
                        unroll_steps=5, n_bootstrap=10,
                        presample_updates=presample))
  optimizer = muzero_optimizer()
  rollout = make_rollout_fn(networks, env, config)
  multi_update = make_multi_update_fn(networks, optimizer, config)

  rng = jax.random.PRNGKey(seed)
  rng, init_rng, env_rng = jax.random.split(rng, 3)
  params = networks.init_params(init_rng, jnp.zeros((1,) + obs_shape))
  train_state = TrainState(params=params, opt_state=optimizer.init(params),
                           step=jnp.asarray(0, jnp.int32))
  env_carry = env.reset(env_rng, num_envs)
  replay_state = replay_init(
      config.replay.capacity, collect_steps, obs_shape,
      networks.num_actions,
      obs_dtype=getattr(env.spec, "obs_dtype", None) or jnp.float32)

  # NOTE: no donate_argnums — donating the replay/env buffers multiplies the
  # XLA compile time ~15x for this program (alias analysis over the fused
  # search custom-call). Same jit config as fit()'s iteration.
  def _iteration(train_state, replay_state, env_carry, rng):
    rollout_rng, update_rng = jax.random.split(rng)
    env_carry, segments, priorities, _ = rollout(
        train_state.params, env_carry, rollout_rng,
        train_state.params.temperature)
    replay_state = replay_add(replay_state, segments, priorities)
    train_state, replay_state, metrics = multi_update(
        train_state, replay_state, update_rng)
    return train_state, replay_state, env_carry, metrics

  # AOT-compile once: the executable serves both execution and the flops
  # readout (a second jit trace would recompile the whole program).
  _progress(f"compiling {policy}/{network} envs={num_envs} "
            f"updates={updates}...")
  t0 = time.time()
  iteration = jax.jit(_iteration).lower(
      train_state, replay_state, env_carry, rng).compile()
  flops_per_iter = _cost_flops(iteration)
  _progress(f"compiled in {time.time() - t0:.0f}s; measuring...")

  # Warm-up: fill replay.
  for _ in range(2):
    rng, it_rng = jax.random.split(rng)
    train_state, replay_state, env_carry, metrics = iteration(
        train_state, replay_state, env_carry, it_rng)
    float(metrics["loss"])

  # Sustained throughput, ONE scalar readback per iteration — exactly how
  # fit() runs. Deeper enqueue-only chaining is NOT faster over the axon
  # tunnel (3x slower at depth 10). `repeats` timed blocks: the headline is
  # the MEDIAN block, with p10/p90 reported so the claim is variance-robust
  # (VERDICT r4 weak #1: single-run point estimates spanned 87.6k-128.8k
  # for the same config over the noisy tunnel).
  def timed_block():
    nonlocal train_state, replay_state, env_carry, rng
    t0 = time.time()
    for _ in range(iters):
      rng, it_rng = jax.random.split(rng)
      train_state, replay_state, env_carry, metrics = iteration(
          train_state, replay_state, env_carry, it_rng)
      float(metrics["loss"])
    return time.time() - t0

  block_dts = sorted(timed_block() / iters for _ in range(max(repeats, 1)))

  def _pct(q):
    # Linear-interpolated percentile over the sorted block times.
    idx = q / 100 * (len(block_dts) - 1)
    lo, hi = int(math.floor(idx)), int(math.ceil(idx))
    frac = idx - lo
    return block_dts[lo] * (1 - frac) + block_dts[hi] * frac

  dt = _pct(50)
  env_steps = num_envs * collect_steps
  repeat_stats = {
      "n_blocks": len(block_dts), "iters_per_block": iters,
      "env_steps_per_s_median": round(env_steps / dt, 1),
      # p10 throughput comes from the p90 (slow) block time and vice versa.
      "env_steps_per_s_p10": round(env_steps / _pct(90), 1),
      "env_steps_per_s_p90": round(env_steps / _pct(10), 1),
      "env_steps_per_s_min": round(env_steps / block_dts[-1], 1),
      "env_steps_per_s_max": round(env_steps / block_dts[0], 1),
  }
  out = {
      "policy": policy,
      "network": network,
      "num_envs": num_envs,
      "num_simulations": num_simulations,
      "batch_size": batch_size,
      "updates_per_iteration": updates,
      "env_steps_per_s": round(env_steps / dt, 1),
      "mcts_sims_per_s": round(env_steps / dt * num_simulations, 1),
      "learner_updates_per_s": round(updates / dt, 2),
      "learner_windows_per_s": round(updates * batch_size / dt, 1),
      "iteration_ms": round(dt * 1e3, 1),
      "repeat_stats": repeat_stats,
  }
  if spi is not None:
    out["samples_per_insert"] = spi
  if flops_per_iter:
    out["flops_per_s"] = round(flops_per_iter / dt, 1)
    out["mfu_vs_bf16_peak"] = round(flops_per_iter / dt / PEAK_FLOPS_BF16, 6)
  return out


def run_az_connect4(*, num_envs: int = 256, num_simulations: int = 64,
                    iters: int = 5, seed: int = 0) -> dict:
  """Connect-Four AlphaZero self-play + learner throughput (moves/s)."""
  import optax

  from muax_tpu.envs import ConnectFour
  from muax_tpu.models.az_networks import make_az_resnet
  from muax_tpu.replay.buffer import replay_add, replay_init
  from muax_tpu.train.selfplay import (AZConfig, make_az_selfplay_fn,
                                       make_az_update_fn)

  game = ConnectFour()
  network = make_az_resnet(7, channels=32, num_blocks=4)
  config = AZConfig(num_simulations=num_simulations, num_envs=num_envs,
                    collect_steps=21, batch_size=512,
                    updates_per_iteration=8, replay_capacity=4096)
  optimizer = optax.adam(2e-3)
  rng = jax.random.PRNGKey(seed)
  rng, init_rng, env_rng = jax.random.split(rng, 3)
  params = network.init_params(init_rng, jnp.zeros((1, 6, 7, 2)))
  opt_state = optimizer.init(params)
  state, _ = jax.vmap(game.reset)(jax.random.split(env_rng, num_envs))
  replay = replay_init(config.replay_capacity, config.collect_steps,
                       (6, 7, 2), 7)
  selfplay = jax.jit(make_az_selfplay_fn(game, network, config))
  update = jax.jit(make_az_update_fn(network, optimizer, config))

  def one_iter(state, replay, params, opt_state, rng):
    rng, sp_rng = jax.random.split(rng)
    state, segments, priorities, metrics = selfplay(
        params, state, sp_rng, jnp.asarray(1.0))
    replay = replay_add(replay, segments, priorities)
    for _ in range(config.updates_per_iteration):
      rng, up_rng = jax.random.split(rng)
      params, opt_state, replay, m = update(params, opt_state, replay,
                                            up_rng)
    return state, replay, params, opt_state, rng, m

  state, replay, params, opt_state, rng, m = one_iter(
      state, replay, params, opt_state, rng)
  float(m["loss"])
  t0 = time.time()
  for _ in range(iters):
    state, replay, params, opt_state, rng, m = one_iter(
        state, replay, params, opt_state, rng)
    float(m["loss"])
  dt = (time.time() - t0) / iters
  moves = num_envs * config.collect_steps
  return {
      "policy": "alphazero", "network": "az_resnet_4x32",
      "num_envs": num_envs, "num_simulations": num_simulations,
      "moves_per_s": round(moves / dt, 1),
      "mcts_sims_per_s": round(moves / dt * num_simulations, 1),
      "learner_updates_per_s": round(config.updates_per_iteration / dt, 2),
      "iteration_ms": round(dt * 1e3, 1),
  }


MATRIX = [
    # (label, kwargs) — reference flagships beyond the headline path:
    # gumbel (muax/policy.py:33-47), acme categorical family
    # (acme/jax/muzero/networks.py:55-136), conv/EZ (nn.py:180-309),
    # stochastic at its 200-sim default (stochastic_muzero/config.py:17).
    ("muzero_mlp_rollout", dict(policy="muzero", network="mlp",
                                num_envs=8192, num_simulations=64,
                                collect_steps=20, batch_size=512,
                                updates=8, iters=5, tile=512)),
    ("gumbel_mlp", dict(policy="gumbel", network="mlp", num_envs=8192,
                        num_simulations=64, collect_steps=20,
                        batch_size=512, updates=8, iters=5, tile=512)),
    ("gumbel_training", dict(policy="gumbel", network="mlp",
                             num_envs=1024, num_simulations=64,
                             collect_steps=20, batch_size=4096,
                             updates=0, iters=5, tile=512, spi=32.0)),
    ("muzero_categorical", dict(policy="muzero", network="categorical",
                                num_envs=2048, num_simulations=64,
                                collect_steps=20, batch_size=256,
                                updates=8, iters=5, tile=256)),
    ("muzero_ez_conv_pixel", dict(policy="muzero", network="ez_conv",
                                  num_envs=512, num_simulations=32,
                                  collect_steps=20, batch_size=128,
                                  updates=8, iters=3, tile=0)),
    # r3 pinned this row to 128 envs: the pure-XLA program at 512 x 200
    # reproducibly faulted the TPU runtime ([B, 201, A+32] HBM tree
    # arrays). r4's fused SMZ forest kernel (search/fused.py) keeps the
    # tree in VMEM — the faulting arrays never exist. r5 finding: SMZ
    # search cost is DATA-DEPENDENT — as the net converges its priors
    # concentrate, trees grow ~200-deep chains, and the kernel's per-sim
    # descent/backup while-loops scale with depth (~20x fresh vs
    # converged; scripts/smz_degradation_series.json). Rows report
    # median/p10/p90 so both regimes are visible; cap via
    # SearchConfig.max_depth in production (see smz_training_depth32).
    ("stochastic_200sims", dict(policy="stochastic", network="smz_mlp",
                                num_envs=256, num_simulations=200,
                                collect_steps=20, batch_size=256,
                                updates=8, iters=3, tile=0)),
    # Training-density rows (VERDICT r3 weak #3): the conv and categorical
    # families at the reference's SPI=32, where MFU is meaningful — the
    # matrix's rollout-ish rows leave "learner-bound" unquantified there.
    ("ez_conv_training", dict(policy="muzero", network="ez_conv",
                              num_envs=256, num_simulations=32,
                              collect_steps=20, batch_size=256,
                              updates=0, iters=2, tile=0, spi=32.0,
                              presample=64)),
    # Same SPI=32 density at batch 1024: the conv grad step carries
    # ~0.7 ms of fixed per-op overhead per update (scripts/
    # conv_scaling_probe_out.json — ms/update flat from B=32 to 128),
    # so fewer, larger updates amortize it. Batch is an implementation
    # lever here, not a reference-pinned constant (the reference never
    # ran a pixel config; its acme default batch is 32).
    ("ez_conv_training_b1024", dict(policy="muzero", network="ez_conv",
                                    num_envs=256, num_simulations=32,
                                    collect_steps=20, batch_size=1024,
                                    updates=0, iters=2, tile=0, spi=32.0,
                                    presample=64)),
    ("categorical_training", dict(policy="muzero", network="categorical",
                                  num_envs=512, num_simulations=64,
                                  collect_steps=20, batch_size=1024,
                                  updates=0, iters=3, tile=256, spi=32.0)),
    # The 601-bin FC-resnet family (acme networks.py:138-216, the
    # 2048-style config) at training density: no raw learner kernel
    # (residual backward not hand-derived), but the r5 HYBRID mode feeds
    # it from the fused sampler.
    ("fc_resnet_training", dict(policy="muzero", network="fc_resnet",
                                num_envs=512, num_simulations=64,
                                collect_steps=20, batch_size=1024,
                                updates=0, iters=3, tile=256, spi=32.0)),
    # Stochastic MuZero at training density (VERDICT r4 item 4): the
    # reference's own 200-sim default (stochastic_muzero/config.py:17)
    # with the SPI=32 learner load. scripts/profile_smz_training.py
    # decomposes where the iteration goes.
    ("smz_training", dict(policy="stochastic", network="smz_mlp",
                          num_envs=256, num_simulations=200,
                          collect_steps=20, batch_size=256,
                          updates=0, iters=2, tile=0, spi=32.0,
                          presample=64)),
    # Same density with the production depth cap: bounds the converged-net
    # while-loop cost at a negligible search-quality change on this env.
    ("smz_training_depth32", dict(policy="stochastic", network="smz_mlp",
                                  num_envs=256, num_simulations=200,
                                  collect_steps=20, batch_size=256,
                                  updates=0, iters=2, tile=0, spi=32.0,
                                  presample=64, max_depth=32)),
    # 512-env stress row (the r3 fault config, un-pinned by the fused
    # kernel); last so its long converged-net blocks don't eat the
    # matrix budget early.
    ("stochastic_200sims_512", dict(policy="stochastic", network="smz_mlp",
                                    num_envs=512, num_simulations=200,
                                    collect_steps=20, batch_size=256,
                                    updates=8, iters=3, tile=0,
                                    repeats=5)),
]


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--num_envs", type=int, default=8192)
  p.add_argument("--num_simulations", type=int, default=64)
  p.add_argument("--collect_steps", type=int, default=20)
  p.add_argument("--batch_size", type=int, default=512)
  p.add_argument("--updates", type=int, default=8)
  p.add_argument("--iters", type=int, default=10)
  p.add_argument("--tile", type=int, default=512,
                 help="fused-kernel batch tile (0 = auto)")
  p.add_argument("--policy", type=str, default=None,
                 help="single mode: muzero | gumbel | stochastic")
  p.add_argument("--network", type=str, default="mlp",
                 help="mlp | categorical | ez_conv | smz_mlp")
  p.add_argument("--spi", type=float, default=None,
                 help="single mode: derive updates from samples_per_insert")
  p.add_argument("--presample", type=int, default=16,
                 help="updates per replay_sample group")
  p.add_argument("--matrix", action="store_true",
                 help="bench the non-flagship paths, write "
                      "BENCH_MATRIX_r05.json")
  p.add_argument("--matrix_out", type=str, default="BENCH_MATRIX_r05.json")
  args = p.parse_args()

  if args.matrix:
    # Incremental + resumable: each row lands in the file as soon as it is
    # measured (a TPU worker crash mid-matrix must not lose prior rows),
    # and already-present rows are skipped on re-run.
    path = args.matrix_out
    rows = {}
    if os.path.exists(path):
      with open(path) as f:
        rows = json.load(f).get("rows", {})

    def save():
      with open(path, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "rows": rows}, f,
                  indent=1)

    for label, kw in MATRIX:
      if label in rows:
        _progress(f"{label}: already measured, skipping")
        continue
      rows[label] = run_config(**kw)
      print(label, json.dumps(rows[label]), flush=True)
      save()
    if "alphazero_connect4" not in rows:
      rows["alphazero_connect4"] = run_az_connect4()
      print("alphazero_connect4", json.dumps(rows["alphazero_connect4"]),
            flush=True)
      save()
    return

  if args.policy is not None:
    res = run_config(policy=args.policy, network=args.network,
                     num_envs=args.num_envs,
                     num_simulations=args.num_simulations,
                     collect_steps=args.collect_steps,
                     batch_size=args.batch_size, updates=args.updates,
                     iters=args.iters, tile=args.tile, spi=args.spi,
                     presample=args.presample)
    print(json.dumps(res))
    return

  # Default: the driver's one-line report — rollout_max + training_regime.
  rollout = run_config(policy="muzero", network="mlp",
                       num_envs=args.num_envs,
                       num_simulations=args.num_simulations,
                       collect_steps=args.collect_steps,
                       batch_size=args.batch_size, updates=args.updates,
                       iters=args.iters, tile=args.tile)
  # The north-star claim must hold at the p10 block, not one lucky run:
  # 7 timed blocks of 5 iterations each (VERDICT r4 item 2).
  training = run_config(policy="muzero", network="mlp", num_envs=1024,
                        num_simulations=args.num_simulations,
                        collect_steps=20, batch_size=4096, updates=0,
                        iters=5, tile=512, spi=32.0, presample=16,
                        repeats=7)
  training["vs_baseline"] = round(
      training["env_steps_per_s"] / BASELINE_ENV_STEPS_PER_S, 3)
  training["vs_baseline_p10"] = round(
      training["repeat_stats"]["env_steps_per_s_p10"]
      / BASELINE_ENV_STEPS_PER_S, 3)

  print(json.dumps({
      "metric": "env_steps_per_s_per_chip",
      "value": rollout["env_steps_per_s"],
      "unit": "env-steps/s/chip",
      "vs_baseline": round(rollout["env_steps_per_s"]
                           / BASELINE_ENV_STEPS_PER_S, 3),
      "mcts_sims_per_s": rollout["mcts_sims_per_s"],
      "num_simulations": args.num_simulations,
      "learner_updates_per_s": rollout["learner_updates_per_s"],
      "num_envs": args.num_envs,
      "flops_per_s": rollout.get("flops_per_s"),
      "training_regime": training,
      # r2 note: learner_updates_per_s in the rollout_max entry is 8
      # updates amortized over a rollout-dominated iteration — it measures
      # iteration rate, not learner capacity. The training_regime entry's
      # learner_windows_per_s is the learner throughput number.
      "device": str(jax.devices()[0]),
  }))


if __name__ == "__main__":
  main()
