"""AlphaZero self-play on Connect Four with the conv resnet tower.

The board-game path past toy scale (reference:
examples/open_spiel/go/run_alphazero.py at reduced board size): env-as-model
search with legal masking and player alternation, `make_az_resnet`
policy/value tower, batch-parallel self-play games inside one jit, periodic
eval vs a uniform-random opponent (target: >= +0.9 mean outcome).

  python examples/run_connect4.py --iterations 300
"""
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_integer("iterations", 300, "training iterations")
flags.DEFINE_integer("num_simulations", 96, "search budget per move")
flags.DEFINE_integer("num_envs", 256, "parallel self-play games")
flags.DEFINE_integer("batch_size", 512, "positions per update")
flags.DEFINE_integer("updates_per_iteration", 8, "grad steps per iteration")
flags.DEFINE_integer("channels", 32, "resnet width")
flags.DEFINE_integer("num_blocks", 4, "resnet depth")
flags.DEFINE_integer("eval_every", 20, "eval cadence (iterations)")
flags.DEFINE_integer("seed", 0, "random seed")
flags.DEFINE_string("out_json", "", "write the learning curve + config "
                    "here (the PARITY2 artifact format)")


def main(_):
  import jax
  import jax.numpy as jnp
  import optax

  from muax_tpu.envs import ConnectFour
  from muax_tpu.models.az_networks import make_az_resnet
  from muax_tpu.replay.buffer import replay_add, replay_init
  from muax_tpu.train.selfplay import (AZConfig, evaluate_vs_random,
                                       make_az_selfplay_fn,
                                       make_az_update_fn)

  game = ConnectFour()
  network = make_az_resnet(7, channels=FLAGS.channels,
                           num_blocks=FLAGS.num_blocks)
  config = AZConfig(num_simulations=FLAGS.num_simulations,
                    num_envs=FLAGS.num_envs, collect_steps=21,
                    batch_size=FLAGS.batch_size,
                    updates_per_iteration=FLAGS.updates_per_iteration,
                    replay_capacity=4096)
  optimizer = optax.adam(2e-3)

  rng = jax.random.PRNGKey(FLAGS.seed)
  rng, init_rng, env_rng = jax.random.split(rng, 3)
  params = network.init_params(init_rng, jnp.zeros((1, 6, 7, 2)))
  opt_state = optimizer.init(params)
  state, _ = jax.vmap(game.reset)(
      jax.random.split(env_rng, FLAGS.num_envs))
  replay = replay_init(config.replay_capacity, config.collect_steps,
                       (6, 7, 2), 7)

  selfplay = jax.jit(make_az_selfplay_fn(game, network, config))
  update = jax.jit(make_az_update_fn(network, optimizer, config))

  t0 = time.time()
  best = -1.0
  curve = []
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
    if (it + 1) % FLAGS.eval_every == 0:
      rng, eval_rng = jax.random.split(rng)
      score = evaluate_vs_random(game, network, params, eval_rng,
                                 num_games=256,
                                 num_simulations=FLAGS.num_simulations)
      best = max(best, score)
      curve.append({"iteration": it + 1, "seconds": round(time.time() - t0, 1),
                    "loss": round(float(m["loss"]), 4),
                    "eval_vs_random": round(float(score), 4)})
      print(f"[{time.time()-t0:6.0f}s] it {it+1}: "
            f"loss={float(m['loss']):.3f} "
            f"eps={int(metrics['episodes_finished'])} "
            f"eval_vs_random={score:+.3f} (best {best:+.3f})", flush=True)

  print(f"final best eval_vs_random: {best:+.3f}")
  if FLAGS.out_json:
    import json
    payload = {
        "experiment": "connect4_alphazero_vs_random",
        "threshold": 0.9,
        "threshold_met": best >= 0.9,
        "best_eval_vs_random": round(float(best), 4),
        "curve": curve,
        "config": {
            "iterations": FLAGS.iterations,
            "num_simulations": FLAGS.num_simulations,
            "num_envs": FLAGS.num_envs,
            "batch_size": FLAGS.batch_size,
            "updates_per_iteration": FLAGS.updates_per_iteration,
            "channels": FLAGS.channels,
            "num_blocks": FLAGS.num_blocks,
            "seed": FLAGS.seed,
            "eval_games": 256,
        },
        "device": str(__import__("jax").devices()[0]),
    }
    with open(FLAGS.out_json, "w") as f:
      json.dump(payload, f, indent=1)
    print("wrote", FLAGS.out_json)


if __name__ == "__main__":
  app.run(main)
