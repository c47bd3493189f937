"""Round 2 microbenchmarks: fixed kernel cost, big tiles, glue-op costs."""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if os.environ.get("JAX_CACHE_DIR"):
  jax.config.update("jax_compilation_cache_dir", os.environ["JAX_CACHE_DIR"])  # opt-in: cache writes hang over the axon tunnel


def timeloop(make_body, inner=10):
  @jax.jit
  def run(x):
    def body(i, acc):
      return acc + make_body(acc)
    return jax.lax.fori_loop(0, inner, body, x)

  run(0.0).block_until_ready()
  times = []
  for _ in range(5):
    t0 = time.time()
    run(0.0).block_until_ready()
    times.append(time.time() - t0)
  times.sort()
  return times[len(times) // 2] / inner


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--num_envs", type=int, default=1024)
  args = p.parse_args()

  from muax_tpu.models import make_mlp_networks
  from muax_tpu.search.fused import extract_fused_weights, fused_muzero_search
  from muax_tpu.train.inference import make_root_fn

  B = args.num_envs
  networks = make_mlp_networks(num_actions=2, embedding_dim=8,
                               support_size=20)
  params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
  weights = extract_fused_weights(networks, params)
  root = jax.jit(make_root_fn(networks))(
      params, jax.random.normal(jax.random.PRNGKey(1), (B, 4)))
  root = jax.block_until_ready(root)

  def kern(sims, tile):
    def body(acc):
      v, val, q = fused_muzero_search(
          root.embedding + 0.0 * acc, root.prior_logits, root.value, weights,
          num_simulations=sims, support_size=networks.support_size,
          discount=0.997, batch_tile=tile)
      return jnp.sum(val) * 1e-9
    return timeloop(body)

  for sims in (0, 1, 2):
    print(f"kernel sims={sims} tile=auto: {kern(sims, None)*1e3:7.3f} ms",
          flush=True)
  for tile in (256, 512, 1024):
    if tile <= B:
      print(f"kernel sims=64 tile={tile:4d}: {kern(64, tile)*1e3:7.3f} ms",
            flush=True)

  # Glue ops at rollout scale.
  key = jax.random.PRNGKey(2)

  def dirichlet_body(acc):
    n = jax.random.dirichlet(key, jnp.full(2, 0.3) + 0.0 * acc,
                             shape=(B,))
    return jnp.sum(n) * 1e-9
  print(f"dirichlet [B,2]       : {timeloop(dirichlet_body)*1e3:7.3f} ms",
        flush=True)

  def gumbel_body(acc):
    g = jax.random.gumbel(key, (B, 2)) + acc
    return jnp.sum(g) * 1e-9
  print(f"gumbel    [B,2]       : {timeloop(gumbel_body)*1e3:7.3f} ms",
        flush=True)

  def cat_body(acc):
    a = jax.random.categorical(key, root.prior_logits + acc)
    return jnp.sum(a.astype(jnp.float32)) * 1e-9
  print(f"categorical [B,2]     : {timeloop(cat_body)*1e3:7.3f} ms",
        flush=True)

  from muax_tpu.envs import AutoResetWrapper, CartPole
  env = AutoResetWrapper(CartPole())
  carry = env.reset(jax.random.PRNGKey(3), B)
  carry = jax.block_until_ready(carry)

  def env_body(acc):
    c2, r, d, info = env.step(carry, jnp.zeros((B,), jnp.int32),
                              jax.random.fold_in(key, 0))
    return jnp.sum(r) * 1e-9 + acc * 0.0
  print(f"env.step  [B]         : {timeloop(env_body)*1e3:7.3f} ms",
        flush=True)


if __name__ == "__main__":
  main()
