"""Train MuZero on CartPole-v1 — the canonical quickstart.

Mirrors the reference's README workflow (README.md:99-143) on the
TPU-native driver: vectorized pure-JAX CartPole, on-device search/replay/
learner. Solves (test_G = 500) within a few hundred episodes.

  python examples/run_cartpole.py --num_iterations 800 --num_simulations 50
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_integer("num_iterations", 800, "training iterations")
flags.DEFINE_integer("num_simulations", 50, "search budget per move")
flags.DEFINE_integer("num_envs", 16, "vectorized environments")
flags.DEFINE_integer("batch_size", 256, "learner batch (windows)")
flags.DEFINE_integer("updates_per_iteration", 64, "grad steps per iteration")
flags.DEFINE_integer("seed", 42, "random seed")
flags.DEFINE_string("model_dir", "models/cartpole", "checkpoint directory")
flags.DEFINE_string("policy", "muzero", "muzero | gumbel")
flags.DEFINE_integer("reanalyze_every", 0, "reanalyze cadence (0 = off)")
flags.DEFINE_string("tensorboard_dir", "", "tensorboard log dir (optional)")


def main(_):
  from muax_tpu.config import (MuZeroConfig, ReplayConfig, SearchConfig,
                               TrainConfig)
  from muax_tpu.envs import CartPole
  from muax_tpu.models import make_mlp_networks, muzero_optimizer
  from muax_tpu.monitor import TrainMonitor
  from muax_tpu.train.fit import fit

  config = MuZeroConfig(
      search=SearchConfig(policy=FLAGS.policy,
                          num_simulations=FLAGS.num_simulations),
      replay=ReplayConfig(capacity=2048, min_fill=64, priority_alpha=0.5),
      train=TrainConfig(num_envs=FLAGS.num_envs, collect_steps=25,
                        batch_size=FLAGS.batch_size,
                        updates_per_iteration=FLAGS.updates_per_iteration,
                        unroll_steps=10, n_bootstrap=10, discount=0.997))
  # The working notebook config: embed 10, support 20, deep heads
  # (examples/cartpole.ipynb in the reference).
  networks = make_mlp_networks(num_actions=2, embedding_dim=10,
                               support_size=20, repr_layers=(),
                               pred_layers=(64, 64, 16),
                               dyn_layers=(64, 64, 16))
  optimizer = muzero_optimizer(peak_lr=2e-2, end_lr=1e-4, warmup_steps=2000,
                               transition_steps=10000, decay_rate=0.8)
  monitor = TrainMonitor(FLAGS.tensorboard_dir or None)

  def log(msg):
    print(msg, flush=True)

  state, results = fit(
      CartPole(), networks, config, optimizer,
      num_iterations=FLAGS.num_iterations, seed=FLAGS.seed,
      eval_every=10, log_every=10, model_dir=FLAGS.model_dir,
      target_reward=500.0, log_fn=log,
      reanalyze_every=FLAGS.reanalyze_every or None)
  print(f"best test_G: {results['best_reward']} "
        f"checkpoint: {results['model_path']}")


if __name__ == "__main__":
  app.run(main)
