"""AlphaZero self-play on TicTacToe.

Mirrors the reference's open_spiel AlphaZero example
(examples/open_spiel/go/run_alphazero.py) at toy scale: env-as-model search,
shared-network self-play, eval vs a random opponent. Perfect play never
loses; the eval score should approach a clearly positive mean (wins vs
random) with draws against itself.

  python examples/run_tictactoe_alphazero.py --iterations 200
"""
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_integer("iterations", 200, "training iterations")
flags.DEFINE_integer("num_simulations", 48, "search budget per move")
flags.DEFINE_integer("num_envs", 128, "parallel self-play games")
flags.DEFINE_integer("batch_size", 256, "positions per update")
flags.DEFINE_integer("updates_per_iteration", 8, "grad steps per iteration")
flags.DEFINE_integer("seed", 0, "random seed")


def main(_):
  import jax
  import jax.numpy as jnp
  import optax

  from muax_tpu.envs.tictactoe import TicTacToe
  from muax_tpu.models.az_networks import make_az_mlp
  from muax_tpu.replay.buffer import replay_add, replay_init
  from muax_tpu.train.selfplay import (AZConfig, evaluate_vs_random,
                                       make_az_selfplay_fn,
                                       make_az_update_fn)

  game = TicTacToe()
  network = make_az_mlp(9, hidden=(128, 128))
  config = AZConfig(num_simulations=FLAGS.num_simulations,
                    num_envs=FLAGS.num_envs, collect_steps=18,
                    batch_size=FLAGS.batch_size,
                    updates_per_iteration=FLAGS.updates_per_iteration)
  optimizer = optax.adam(1e-3)

  rng = jax.random.PRNGKey(FLAGS.seed)
  rng, init_rng, env_rng = jax.random.split(rng, 3)
  params = network.init_params(init_rng, jnp.zeros((1, 3, 3, 2)))
  opt_state = optimizer.init(params)
  state, _ = jax.vmap(game.reset)(
      jax.random.split(env_rng, FLAGS.num_envs))
  replay = replay_init(config.replay_capacity, config.collect_steps,
                       (3, 3, 2), 9)

  selfplay = jax.jit(make_az_selfplay_fn(game, network, config))
  update = jax.jit(make_az_update_fn(network, optimizer, config))

  t0 = time.time()
  for it in range(FLAGS.iterations):
    rng, sp_rng = jax.random.split(rng)
    temperature = 1.0 if it < FLAGS.iterations // 2 else 0.5
    state, segments, priorities, metrics = selfplay(
        params, state, sp_rng, jnp.asarray(temperature))
    replay = replay_add(replay, segments, priorities)
    for _ in range(config.updates_per_iteration):
      rng, up_rng = jax.random.split(rng)
      params, opt_state, replay, m = update(params, opt_state, replay,
                                            up_rng)
    if (it + 1) % 20 == 0:
      rng, eval_rng = jax.random.split(rng)
      score = evaluate_vs_random(game, network, params, eval_rng,
                                 num_games=128,
                                 num_simulations=FLAGS.num_simulations)
      print(f"[{time.time()-t0:6.0f}s] it {it+1}: "
            f"loss={float(m['loss']):.3f} "
            f"eps={int(metrics['episodes_finished'])} "
            f"eval_vs_random={score:+.3f}", flush=True)


if __name__ == "__main__":
  app.run(main)
