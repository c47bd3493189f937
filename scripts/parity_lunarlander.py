"""Parity artifact: Gumbel MuZero learns LunarLander (BASELINE.md config 2).

Runs the reference's lunarlander notebook config
(/root/reference/examples/lunarlander.ipynb: PNStep(50, 0.999, 0.5),
peak lr 2e-3, support 20, embed 10, ~60k total updates) through the host
gym adapter and writes PARITY3_r05.json with the full eval curve.

Forced CPU backend: the host-env escape hatch uses jax.experimental
.io_callback, which wedges the tunneled TPU runtime in this image
(documented in CHANGES_r04.md / PARITY.md) — the reference notebook also
trains this config on CPU-class hardware.

  python scripts/parity_lunarlander.py --seed 0 --out PARITY3_r05.json
"""
import argparse
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The build image's sitecustomize registers the tunneled TPU plugin and
# force-sets jax_platforms before user code runs; env vars alone are too
# late. Re-pin the config so this really is a CPU run (io_callback is not
# supported over the tunnel).
jax.config.update("jax_platforms", "cpu")


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--seed", type=int, default=0)
  p.add_argument("--num_iterations", type=int, default=2000)
  p.add_argument("--out", type=str, default="PARITY3_r05.json")
  args = p.parse_args()

  from muax_tpu.config import (MuZeroConfig, ReplayConfig, SearchConfig,
                               TrainConfig)
  from muax_tpu.envs.gym_adapter import GymVectorPool
  from muax_tpu.models import make_mlp_networks, muzero_optimizer
  from muax_tpu.train.fit import fit

  def make_pool(num_envs, seed):
    try:
      return GymVectorPool("LunarLander-v3", num_envs=num_envs, seed=seed)
    except Exception:  # older gymnasium naming
      return GymVectorPool("LunarLander-v2", num_envs=num_envs, seed=seed)

  num_envs = 16
  pool = make_pool(num_envs, args.seed)
  eval_pool = make_pool(8, args.seed + 10_000)

  # Reference notebook regime: n-step 50, discount 0.999, alpha 0.5,
  # peak lr 2e-3; 32 updates/iteration * 2000 iterations ~= the notebook's
  # 60k total updates.
  config = MuZeroConfig(
      search=SearchConfig(policy="gumbel", num_simulations=64),
      replay=ReplayConfig(capacity=4096, min_fill=128, priority_alpha=0.5),
      train=TrainConfig(num_envs=num_envs, collect_steps=25, batch_size=256,
                        updates_per_iteration=32, unroll_steps=10,
                        n_bootstrap=50, discount=0.999))
  networks = make_mlp_networks(num_actions=pool.spec.num_actions,
                               embedding_dim=10, support_size=20,
                               repr_layers=(), pred_layers=(64, 64, 16),
                               dyn_layers=(64, 64, 16))
  optimizer = muzero_optimizer(peak_lr=2e-3, end_lr=1e-4, warmup_steps=2000,
                               transition_steps=20000, decay_rate=0.8)

  t0 = time.time()
  state, results = fit(
      pool, networks, config, optimizer,
      num_iterations=args.num_iterations, seed=args.seed,
      eval_every=25, log_every=5, model_dir="models/lunarlander_parity",
      target_reward=200.0, eval_env=eval_pool,
      log_fn=lambda m: print(m, flush=True))
  wall = time.time() - t0

  solve_iteration = None
  curve = []
  for row in results["history"]:
    if "test_G" in row:
      curve.append({"iteration": row["iteration"], "test_G": row["test_G"]})
      if row["test_G"] >= 200.0 and solve_iteration is None:
        solve_iteration = row["iteration"]

  out = {
      "claim": "LunarLander avg test_G >= 200 (gym solve bar) under the "
               "reference notebook config (lunarlander.ipynb: "
               "PNStep(50, 0.999, 0.5), peak lr 2e-3, support 20, embed 10)",
      "config": "gumbel 64 sims, 16 envs x 25 steps, batch 256, "
                "32 updates/iter, unroll 10, n-step 50, discount 0.999, "
                "peak lr 2e-3",
      "backend_note": "CPU backend: host gym pool uses io_callback, which "
                      "wedges the tunneled TPU runtime in this image "
                      "(CHANGES_r04.md methodology note)",
      "seed": args.seed,
      "solved": solve_iteration is not None,
      "solve_iteration": solve_iteration,
      "best_test_G": results["best_reward"],
      # fit early-stops at target_reward, so count executed iterations.
      "total_updates": (results["history"][-1]["iteration"] * 32
                        if results["history"] else 0),
      "budget_updates": args.num_iterations * 32,
      "wall_seconds": round(wall, 1),
      "device": str(jax.devices()[0]),
      "eval_curve": curve,
  }
  with open(args.out, "w") as f:
    json.dump(out, f, indent=1)
  print(json.dumps({k: v for k, v in out.items() if k != "eval_curve"}))


if __name__ == "__main__":
  main()
