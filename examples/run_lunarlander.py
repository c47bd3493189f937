"""Gumbel MuZero on LunarLander-v3 via the host gym adapter.

Mirrors the reference's lunarlander notebook (examples/lunarlander.ipynb:
PNStep(50, 0.999, 0.5), peak lr 2e-3) with the host-env escape hatch —
environment physics on CPU, search/replay/learner on device.

  python examples/run_lunarlander.py --num_iterations 2000
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_integer("num_iterations", 2000, "training iterations")
flags.DEFINE_integer("num_simulations", 64, "search budget per move")
flags.DEFINE_integer("num_envs", 16, "host gym envs in the pool")
flags.DEFINE_integer("batch_size", 256, "learner batch")
flags.DEFINE_integer("updates_per_iteration", 32, "grad steps per iteration")
flags.DEFINE_integer("seed", 0, "random seed")


def main(_):
  # Pin to CPU if the ambient backend cannot proxy host callbacks
  # (e.g. a relayed chip) -- must run before any jax device use.
  from muax_tpu.envs.gym_adapter import ensure_host_callback_backend
  ensure_host_callback_backend()
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

  pool = make_pool(FLAGS.num_envs, FLAGS.seed)
  # Dedicated eval pool: greedy eval must not step the training envs.
  eval_pool = make_pool(min(8, FLAGS.num_envs), FLAGS.seed + 10_000)

  config = MuZeroConfig(
      search=SearchConfig(policy="gumbel",
                          num_simulations=FLAGS.num_simulations),
      replay=ReplayConfig(capacity=4096, min_fill=128,
                          priority_alpha=0.5),
      train=TrainConfig(num_envs=FLAGS.num_envs, collect_steps=25,
                        batch_size=FLAGS.batch_size,
                        updates_per_iteration=FLAGS.updates_per_iteration,
                        unroll_steps=10, n_bootstrap=50, discount=0.999))
  networks = make_mlp_networks(num_actions=pool.spec.num_actions,
                               embedding_dim=10, support_size=20,
                               repr_layers=(), pred_layers=(64, 64, 16),
                               dyn_layers=(64, 64, 16))
  optimizer = muzero_optimizer(peak_lr=2e-3, end_lr=1e-4, warmup_steps=2000,
                               transition_steps=20000, decay_rate=0.8)
  state, results = fit(pool, networks, config, optimizer,
                       num_iterations=FLAGS.num_iterations, seed=FLAGS.seed,
                       eval_every=25, log_every=10,
                       model_dir="models/lunarlander", target_reward=200.0,
                       eval_env=eval_pool)
  print("best test_G:", results["best_reward"])


if __name__ == "__main__":
  app.run(main)
