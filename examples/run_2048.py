"""MuZero / Stochastic MuZero on the native C++ 2048 pool.

Mirrors the reference's game2048 example (examples/rl_discrete/game2048/,
which trains on jumanji Game2048-v1). The environment's random tile spawns
make it a natural Stochastic MuZero benchmark (--policy stochastic trains
the 5-network agent; default muzero treats spawns as noise).

  python examples/run_2048.py --num_iterations 500
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_integer("num_iterations", 500, "training iterations")
flags.DEFINE_integer("num_simulations", 50, "search budget per move")
flags.DEFINE_integer("num_envs", 64, "parallel boards")
flags.DEFINE_integer("batch_size", 256, "learner batch")
flags.DEFINE_integer("updates_per_iteration", 16, "grad steps per iteration")
flags.DEFINE_integer("seed", 0, "random seed")
flags.DEFINE_string("policy", "muzero", "muzero | gumbel")


def main(_):
  # Pin to CPU if the ambient backend cannot proxy host callbacks
  # (e.g. a relayed chip) -- must run before any jax device use.
  from muax_tpu.envs.gym_adapter import ensure_host_callback_backend
  ensure_host_callback_backend()
  from muax_tpu.config import (MuZeroConfig, ReplayConfig, SearchConfig,
                               TrainConfig)
  from muax_tpu.envs.native2048 import Native2048Pool
  from muax_tpu.models import make_mlp_networks, muzero_optimizer
  from muax_tpu.train.fit import fit

  pool = Native2048Pool(num_envs=FLAGS.num_envs, seed=FLAGS.seed)
  # Dedicated eval pool: greedy eval must not step the training boards.
  eval_pool = Native2048Pool(num_envs=min(16, FLAGS.num_envs),
                             seed=FLAGS.seed + 10_000)
  config = MuZeroConfig(
      search=SearchConfig(policy=FLAGS.policy,
                          num_simulations=FLAGS.num_simulations),
      replay=ReplayConfig(capacity=2048, min_fill=128),
      train=TrainConfig(num_envs=FLAGS.num_envs, collect_steps=32,
                        batch_size=FLAGS.batch_size,
                        updates_per_iteration=FLAGS.updates_per_iteration,
                        unroll_steps=5, n_bootstrap=10, discount=0.999))
  # 2048-style fully-connected resnet tower with a wide support (the
  # reference's game2048 config uses support 0..600; h-transform integer
  # support 300 covers rewards up to ~10^5 after compression).
  networks = make_mlp_networks(num_actions=4, embedding_dim=64,
                               support_size=300,
                               repr_layers=(256, 256),
                               pred_layers=(256, 256),
                               dyn_layers=(256, 256))
  optimizer = muzero_optimizer(peak_lr=1e-2, end_lr=1e-4, warmup_steps=2000,
                               transition_steps=20000, decay_rate=0.8)
  state, results = fit(pool, networks, config, optimizer,
                       num_iterations=FLAGS.num_iterations, seed=FLAGS.seed,
                       eval_every=25, log_every=10,
                       model_dir="models/2048", eval_env=eval_pool)
  print("best mean score:", results["best_reward"])


if __name__ == "__main__":
  app.run(main)
