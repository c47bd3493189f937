"""Microbenchmarks isolating the fused-search kernel's cost drivers.

Times the kernel inside a fori_loop (one dispatch, n invocations) across
num_simulations and batch tiles — separates dispatch overhead, per-sim cost,
and tile-size effects to aim optimization work. Builder tool, not library.
"""
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


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--num_envs", type=int, default=1024)
  p.add_argument("--inner", type=int, default=10)
  args = p.parse_args()

  from muax_tpu.models import make_mlp_networks
  from muax_tpu.search.fused import extract_fused_weights, fused_muzero_search
  from muax_tpu.train.inference import make_root_fn

  B = args.num_envs
  networks = make_mlp_networks(num_actions=2, embedding_dim=8,
                               support_size=20)
  rng = jax.random.PRNGKey(0)
  params = networks.init_params(rng, jnp.zeros((1, 4)))
  weights = extract_fused_weights(networks, params)
  root_fn = jax.jit(make_root_fn(networks))
  obs = jax.random.normal(jax.random.PRNGKey(1), (B, 4))
  root = root_fn(params, obs)
  root = jax.tree.map(lambda x: jax.block_until_ready(x), root)

  def bench(sims, tile):
    @jax.jit
    def run(emb, logits, value):
      def body(i, acc):
        # acc-dependent input defeats loop-invariant hoisting/CSE.
        v, val, q = fused_muzero_search(
            emb + 0.0 * acc, logits, value, weights,
            num_simulations=sims, support_size=networks.support_size,
            discount=0.997, batch_tile=tile)
        return acc + jnp.sum(val) * 1e-9
      return jax.lax.fori_loop(0, args.inner, body, 0.0)

    run(root.embedding, root.prior_logits, root.value).block_until_ready()
    times = []
    for _ in range(5):
      t0 = time.time()
      run(root.embedding, root.prior_logits, root.value).block_until_ready()
      times.append(time.time() - t0)
    times.sort()
    return times[len(times) // 2] / args.inner

  t64 = bench(64, None)
  t32 = bench(32, None)
  t8 = bench(8, None)
  print(f"B={B} kernel: sims=8 {t8*1e3:7.3f} ms | sims=32 {t32*1e3:7.3f} ms"
        f" | sims=64 {t64*1e3:7.3f} ms")
  print(f"  marginal per-sim (32->64): {(t64-t32)/32*1e6:.1f} us"
        f" | fixed overhead est: {(2*t32-t64)*1e3:.3f} ms")
  for tile in (64, 128, 256):
    if tile <= B:
      tt = bench(64, tile)
      print(f"  tile={tile:4d}: {tt*1e3:7.3f} ms")


if __name__ == "__main__":
  main()
