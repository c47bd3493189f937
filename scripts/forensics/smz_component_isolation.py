"""Resume the captured degraded SMZ state; time rollout-only and
learner-only separately to locate the slow component."""
import pickle, sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax, jax.numpy as jnp

NUM_ENVS, COLLECT, SIMS, BATCH = 256, 20, 200, 256
def sync(x): return float(jnp.asarray(x).reshape(-1)[0])

from muax_tpu.config import MuZeroConfig, ReplayConfig, SearchConfig, TrainConfig
from muax_tpu.envs import AutoResetWrapper, CartPole
from muax_tpu.models import make_stochastic_mlp_networks, muzero_optimizer
from muax_tpu.replay.buffer import replay_add, replay_init
from muax_tpu.train.actor import make_rollout_fn
from muax_tpu.train.learner import TrainState, make_multi_update_fn

env = AutoResetWrapper(CartPole())
networks = make_stochastic_mlp_networks(2, num_chance_outcomes=32,
                                        embedding_dim=32, support_size=20)
optimizer = muzero_optimizer()
config = MuZeroConfig(
    search=SearchConfig(policy="stochastic", num_simulations=SIMS),
    replay=ReplayConfig(capacity=2048, min_fill=64),
    train=TrainConfig(num_envs=NUM_ENVS, collect_steps=COLLECT,
                      batch_size=BATCH, updates_per_iteration=8,
                      unroll_steps=5, n_bootstrap=10, presample_updates=16))
rollout = make_rollout_fn(networks, env, config)
multi_update = make_multi_update_fn(networks, optimizer, config)

params_t, rs_t, live_obs = pickle.load(open("/tmp/smz_captured.pkl", "rb"))
params_t = jax.tree.map(jnp.asarray, params_t)
rs_t = jax.tree.map(jnp.asarray, rs_t)

rng = jax.random.PRNGKey(0)
rng, init_rng, env_rng = jax.random.split(rng, 3)
params_0 = networks.init_params(init_rng, jnp.zeros((1, 4)))
carry = env.reset(env_rng, NUM_ENVS)
rs_0 = replay_init(2048, COLLECT, (4,), 2)

@jax.jit
def roll_only(params, carry, rng):
  carry, segments, priorities, m = rollout(params, carry, rng,
                                           params.temperature)
  return carry, m

@jax.jit
def learn_only(ts, rs, rng):
  ts2, rs2, metrics = multi_update(ts, rs, rng)
  return ts2, metrics

for label, params in [("init", params_0), ("trained", params_t)]:
  rng, r = jax.random.split(rng)
  c2, m = roll_only(params, carry, r)
  sync(m["mean_episode_return"])
  for k in range(2):
    t0 = time.time()
    rng, r = jax.random.split(rng)
    c2, m = roll_only(params, c2, r)
    sync(m["mean_episode_return"])
    print(f"rollout[{label}] {k}: {(time.time()-t0)*1e3:7.1f} ms",
          flush=True)

for label, params, rs in [("init_params+fresh_ring", params_0, rs_0),
                          ("trained_params+trained_ring", params_t, rs_t),
                          ("init_params+trained_ring", params_0, rs_t),
                          ("trained_params+fresh_ring", params_t, rs_0)]:
  ts = TrainState(params=params, opt_state=optimizer.init(params),
                  step=jnp.asarray(0, jnp.int32))
  rng, r = jax.random.split(rng)
  ts2, m = learn_only(ts, rs, r)
  sync(m["loss"])
  for k in range(2):
    t0 = time.time()
    rng, r = jax.random.split(rng)
    ts2, m = learn_only(ts2, rs, r)
    sync(m["loss"])
    print(f"learner[{label}] {k}: {(time.time()-t0)*1e3:7.1f} ms",
          flush=True)
