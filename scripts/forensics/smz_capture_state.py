"""Run the SMZ series until degradation, then save params + replay state
for offline numerics analysis."""
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
rng = jax.random.PRNGKey(0)
rng, init_rng, env_rng = jax.random.split(rng, 3)
params = networks.init_params(init_rng, jnp.zeros((1, 4)))
ts = TrainState(params=params, opt_state=optimizer.init(params),
                step=jnp.asarray(0, jnp.int32))
carry = env.reset(env_rng, NUM_ENVS)
rs = replay_init(2048, COLLECT, (4,), 2)

@jax.jit
def iteration(ts, rs, carry, rng):
  r1, r2 = jax.random.split(rng)
  carry, segments, priorities, _ = rollout(ts.params, carry, r1,
                                           ts.params.temperature)
  rs = replay_add(rs, segments, priorities)
  ts, rs, metrics = multi_update(ts, rs, r2)
  return ts, rs, carry, metrics

rng, r = jax.random.split(rng)
ts, rs, carry, m = iteration(ts, rs, carry, r)
sync(m["loss"])
print("compiled", flush=True)
for i in range(10):
  t0 = time.time()
  rng, r = jax.random.split(rng)
  ts, rs, carry, m = iteration(ts, rs, carry, r)
  loss = sync(m["loss"])
  print(f"it {i:02d}: {(time.time()-t0)*1e3:7.1f} ms loss={loss:.3f}",
        flush=True)

host = jax.tree.map(lambda x: jax.device_get(x), (ts.params, rs, carry.obs))
with open("/tmp/smz_captured.pkl", "wb") as f:
  pickle.dump(host, f)
print("saved /tmp/smz_captured.pkl", flush=True)
