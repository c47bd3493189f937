"""MCTS agent over a SIMULATOR or a LEARNED transition model.

Mirror of the reference's ``examples/run_mcts.py`` (bsuite Catch + tf MCTS
agent with a ``--simulator`` flag choosing models/simulator.py vs the
online-SGD MLPModel, run_mcts.py:44-104) — rebuilt vectorized: B games of
pure-JAX Catch play in parallel inside jit, the search walks either the
real env (env-as-model) or an MLP transition model trained by online SGD
from its own device-resident replay (models/env_model.py), and the
policy/value net learns from search visits + n-step returns.

  python examples/run_mcts.py --simulator          # env-as-model
  python examples/run_mcts.py --nosimulator        # learned model
"""
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_bool("simulator", True,
                  "search the real env (True) or a learned model (False)")
flags.DEFINE_integer("iterations", 60, "training iterations")
flags.DEFINE_integer("num_envs", 64, "parallel games")
flags.DEFINE_integer("collect_steps", 10, "env steps per iteration")
flags.DEFINE_integer("num_simulations", 32, "search budget per move")
flags.DEFINE_integer("rows", 5, "Catch rows")
flags.DEFINE_integer("seed", 0, "random seed")


def main(_):
  import jax
  import jax.numpy as jnp
  import optax

  from muax_tpu.envs import AutoResetWrapper, Catch
  from muax_tpu.models.az_networks import make_az_mlp
  from muax_tpu.models.env_model import (
      ModelSearchParams, make_mlp_transition_model, make_model_policy_fn,
      make_model_update_fn, make_simulator_policy_fn, model_replay_add,
      model_replay_init)
  from muax_tpu.ops import segment_n_step_returns

  env = Catch(rows=FLAGS.rows, columns=5)
  wrapped = AutoResetWrapper(env)
  B = FLAGS.num_envs
  network = make_az_mlp(env.spec.num_actions, hidden=(128, 128))
  net_opt = optax.adam(1e-3)

  rng = jax.random.PRNGKey(FLAGS.seed)
  rng, net_rng, env_rng = jax.random.split(rng, 3)
  sample_obs = jnp.zeros((1,) + env.spec.observation_shape)
  net_params = network.init_params(net_rng, sample_obs)
  net_opt_state = net_opt.init(net_params)
  carry = wrapped.reset(env_rng, B)

  if FLAGS.simulator:
    policy_fn = make_simulator_policy_fn(
        env, network, num_simulations=FLAGS.num_simulations, discount=1.0)
    model = model_params = model_opt_state = model_replay = None
    model_update = None
  else:
    model = make_mlp_transition_model(env.spec.num_actions,
                                      env.spec.observation_shape,
                                      hidden=(128, 128))
    model_opt = optax.adam(3e-3)
    rng, model_rng = jax.random.split(rng)
    model_params = model.init_params(model_rng, sample_obs)
    model_opt_state = model_opt.init(model_params)
    model_replay = model_replay_init(4096, env.spec.observation_shape)
    model_update = jax.jit(make_model_update_fn(
        model, model_opt, batch_size=256, num_sgd_steps=20))
    policy_fn = make_model_policy_fn(
        model, network, num_simulations=FLAGS.num_simulations,
        discount=1.0, terminal_tol=0.1)

  @jax.jit
  def collect(net_params, model_params, carry, rng):
    """Scan: search-act -> env.step; returns segments for both learners."""
    def step_fn(c, rng_t):
      policy_rng, env_rng = jax.random.split(rng_t)
      if FLAGS.simulator:
        action, pi, root_value = policy_fn(net_params, policy_rng,
                                           c.env_state, c.obs,
                                           jnp.asarray(1.0))
      else:
        sp = ModelSearchParams(network=net_params, model=model_params)
        action, pi, root_value = policy_fn(sp, policy_rng, c.obs,
                                           jnp.asarray(1.0))
      new_c, reward, done, _ = wrapped.step(c, action, env_rng)
      store = dict(obs=c.obs, action=action, reward=reward, done=done,
                   next_obs=new_c.obs, pi=pi, value=root_value)
      return new_c, store

    carry, steps = jax.lax.scan(step_fn, carry,
                                jax.random.split(rng, FLAGS.collect_steps))
    return carry, steps

  @jax.jit
  def net_update(net_params, net_opt_state, steps):
    """Policy CE toward search visits + value MSE toward n-step returns
    (the AZLearner recipe, acme/tf/mcts/learning.py:29-120, vectorized)."""
    z = segment_n_step_returns(steps["reward"], steps["value"],
                               steps["done"].astype(jnp.float32),
                               discount=1.0, n=FLAGS.collect_steps)
    obs = steps["obs"].reshape((-1,) + steps["obs"].shape[2:])
    pi = steps["pi"].reshape((-1, steps["pi"].shape[-1]))
    zf = z.reshape(-1)

    def loss_fn(p):
      logits, value = network.apply(p, obs)
      policy_loss = -jnp.mean(jnp.sum(
          jax.lax.stop_gradient(pi) * jax.nn.log_softmax(logits, -1), -1))
      value_loss = jnp.mean(jnp.square(value - jax.lax.stop_gradient(zf)))
      return policy_loss + value_loss

    loss, grads = jax.value_and_grad(loss_fn)(net_params)
    updates, net_opt_state = net_opt.update(grads, net_opt_state)
    return optax.apply_updates(net_params, updates), net_opt_state, loss

  t0 = time.time()
  for it in range(FLAGS.iterations):
    rng, c_rng, u_rng = jax.random.split(rng, 3)
    carry, steps = collect(net_params, model_params, carry, c_rng)

    if not FLAGS.simulator:
      flat = jax.tree.map(
          lambda x: x.reshape((-1,) + x.shape[2:]), steps)
      model_replay = model_replay_add(
          model_replay, flat["obs"], flat["action"], flat["reward"],
          flat["next_obs"], flat["done"])
      model_params, model_opt_state, m_metrics = model_update(
          model_params, model_opt_state, model_replay, u_rng)

    net_params, net_opt_state, loss = net_update(net_params, net_opt_state,
                                                 steps)
    if (it + 1) % 10 == 0:
      caught = float(jnp.sum(jnp.where(steps["reward"] > 0, 1.0, 0.0)))
      missed = float(jnp.sum(jnp.where(steps["reward"] < 0, 1.0, 0.0)))
      rate = caught / max(caught + missed, 1.0)
      extra = ""
      if not FLAGS.simulator:
        extra = f" model_loss={float(m_metrics['model_loss']):.4f}"
      print(f"[{time.time()-t0:5.0f}s] it {it+1}: loss={float(loss):.3f} "
            f"catch_rate={rate:.2f}{extra}", flush=True)

  print(f"done ({'simulator' if FLAGS.simulator else 'learned model'})")


if __name__ == "__main__":
  app.run(main)
