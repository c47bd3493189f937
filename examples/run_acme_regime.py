"""MuZero on CartPole at the REFERENCE's acme data regime.

The acme-jax MuZero defaults (acme/jax/muzero/config.py:17,30-66): 50
simulations, batch 32 x 8 gradient steps per learner step, unroll 5,
n-step 10, discount .99, offline/online 50/50 replay mix, and the Reverb
SampleToInsertRatio limiter at samples_per_insert=32 with 10% tolerance —
all of which `muax_tpu.config.acme_defaults()` reproduces. The SPI gate
means the learner is throttled to 32 sampled windows per inserted env
step, exactly the reference's data diet.

  python examples/run_acme_regime.py --num_iterations 300
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_integer("num_iterations", 300, "training iterations")
flags.DEFINE_integer("num_envs", 64, "vectorized environments")
flags.DEFINE_integer("seed", 42, "random seed")


def main(_):
  from muax_tpu.config import acme_defaults
  from muax_tpu.envs import CartPole
  from muax_tpu.models import create_optimizer, make_mlp_networks

  from muax_tpu.train.fit import fit

  config = acme_defaults(num_envs=FLAGS.num_envs, collect_steps=20,
                         batch_size=256)
  networks = make_mlp_networks(num_actions=2, embedding_dim=10,
                               support_size=20, pred_layers=(64, 64, 16),
                               dyn_layers=(64, 64, 16))
  # The acme reference optimizer: adamw 1e-4 (config.py:38).
  optimizer = create_optimizer("adamw", lr=1e-4)

  state, results = fit(
      CartPole(), networks, config, optimizer,
      num_iterations=FLAGS.num_iterations, seed=FLAGS.seed,
      eval_every=20, log_every=10, model_dir="/tmp/muax_acme_regime",
      target_reward=500.0)
  print(f"best eval return: {results['best_reward']:.1f}; "
        f"learner steps: {int(state.step)} "
        f"(SPI-gated at 32 windows per inserted step)")


if __name__ == "__main__":
  app.run(main)
