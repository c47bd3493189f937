"""rollout[trained] time vs search.max_depth: quantify the depth-driven
cost of the SMZ kernel's while-loops with a converged net."""
import pickle, sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax, jax.numpy as jnp

NUM_ENVS, COLLECT, SIMS = 256, 20, 200
def sync(x): return float(jnp.asarray(x).reshape(-1)[0])

from muax_tpu.config import MuZeroConfig, ReplayConfig, SearchConfig, TrainConfig
from muax_tpu.envs import AutoResetWrapper, CartPole
from muax_tpu.models import make_stochastic_mlp_networks
from muax_tpu.train.actor import make_rollout_fn

env = AutoResetWrapper(CartPole())
networks = make_stochastic_mlp_networks(2, num_chance_outcomes=32,
                                        embedding_dim=32, support_size=20)
params_t, rs_t, live_obs = pickle.load(open("/tmp/smz_captured.pkl", "rb"))
params_t = jax.tree.map(jnp.asarray, params_t)
rng = jax.random.PRNGKey(0)
rng, env_rng = jax.random.split(rng)

for md in [None, 64, 32, 16]:
  config = MuZeroConfig(
      search=SearchConfig(policy="stochastic", num_simulations=SIMS,
                          max_depth=md),
      replay=ReplayConfig(capacity=2048, min_fill=64),
      train=TrainConfig(num_envs=NUM_ENVS, collect_steps=COLLECT,
                        batch_size=256, updates_per_iteration=8,
                        unroll_steps=5, n_bootstrap=10))
  rollout = make_rollout_fn(networks, env, config)
  roll = jax.jit(lambda p, c, r, rollout=rollout: rollout(
      p, c, r, p.temperature))
  carry = env.reset(env_rng, NUM_ENVS)
  rng, r = jax.random.split(rng)
  carry, seg, pri, m = roll(params_t, carry, r)
  sync(m["mean_episode_return"])
  best = 1e9
  for _ in range(2):
    t0 = time.time()
    rng, r = jax.random.split(rng)
    carry, seg, pri, m = roll(params_t, carry, r)
    sync(m["mean_episode_return"])
    best = min(best, time.time() - t0)
  print(f"max_depth={md}: {best*1e3:7.1f} ms  G={sync(m['mean_episode_return']):.1f}",
        flush=True)
