"""Train MuZero from PIXELS with the EfficientZero conv family.

The pure-JAX analog of the reference's Atari configuration
(examples/rl_discrete/helpers.py:71-107: 84x84 frames, frame stacking,
muax/nn.py:180-309 conv triplet): PixelCatch renders Catch on device at
80x80x1; four frames are channel-stacked; everything (env, search, replay,
learner) runs inside one jitted iteration.

  python examples/run_pixel.py --num_iterations 300
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_integer("num_iterations", 300, "training iterations")
flags.DEFINE_integer("num_simulations", 25, "search budget per move")
flags.DEFINE_integer("num_envs", 64, "vectorized environments")
flags.DEFINE_integer("batch_size", 128, "learner batch (windows)")
flags.DEFINE_integer("updates_per_iteration", 16, "grad steps per iteration")
flags.DEFINE_integer("rows", 10, "Catch rows")
flags.DEFINE_integer("columns", 5, "Catch columns")
flags.DEFINE_integer("scale", 8, "pixels per board cell (8 -> 80x80 frames)")
flags.DEFINE_integer("num_frames", 4, "channel-stacked history frames")
flags.DEFINE_integer("channels", 16, "conv channels")
flags.DEFINE_integer("num_blocks", 1, "residual blocks per conv stack")
flags.DEFINE_integer("seed", 42, "random seed")
flags.DEFINE_string("model_dir", "models/pixel", "checkpoint directory")


def main(_):
  from muax_tpu.config import (MuZeroConfig, ReplayConfig, SearchConfig,
                               TrainConfig)
  from muax_tpu.envs import PixelCatch
  from muax_tpu.envs.wrappers import FrameStackingEnv
  from muax_tpu.models import create_optimizer, make_efficientzero_networks
  from muax_tpu.train.fit import fit

  import jax.numpy as jnp
  # uint8 frames (the reference ALE convention): the replay ring stores
  # raw bytes and the conv net up-casts on entry.
  env = FrameStackingEnv(
      PixelCatch(rows=FLAGS.rows, columns=FLAGS.columns, scale=FLAGS.scale,
                 dtype=jnp.uint8),
      num_frames=FLAGS.num_frames, stack=False)
  config = MuZeroConfig(
      search=SearchConfig(num_simulations=FLAGS.num_simulations,
                          dirichlet_alpha=1.0),
      replay=ReplayConfig(capacity=1024, min_fill=64),
      train=TrainConfig(num_envs=FLAGS.num_envs, collect_steps=12,
                        batch_size=FLAGS.batch_size,
                        updates_per_iteration=FLAGS.updates_per_iteration,
                        unroll_steps=5, n_bootstrap=10, discount=0.997))
  networks = make_efficientzero_networks(
      num_actions=3, support_size=5, channels=FLAGS.channels,
      num_blocks=FLAGS.num_blocks, downsample=True)
  optimizer = create_optimizer("adam", lr=1e-3)

  state, results = fit(
      env, networks, config, optimizer,
      num_iterations=FLAGS.num_iterations, seed=FLAGS.seed,
      eval_every=20, log_every=10, model_dir=FLAGS.model_dir,
      target_reward=0.95, log_fn=lambda m: print(m, flush=True))
  print(f"best test_G: {results['best_reward']} "
        f"checkpoint: {results['model_path']}")


if __name__ == "__main__":
  app.run(main)
