"""Builder tool: throughput of the fused kernel vs tile size / batch.

Enqueues N calls back-to-back and syncs once (throughput), unlike
profile_breakdown's per-call blocking (latency).
"""
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
  p.add_argument("--num_simulations", type=int, default=64)
  p.add_argument("--tiles", type=str, default="0,128,256,512,1024")
  p.add_argument("--iters", type=int, default=20)
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
  obs = jax.random.normal(rng, (B, 4))
  root = root_fn(params, obs)

  for tile_s in args.tiles.split(","):
    tile = int(tile_s)

    def search_only(emb, logits, value):
      v, rv, q = fused_muzero_search(
          emb, logits, value, weights,
          num_simulations=args.num_simulations,
          support_size=networks.support_size, discount=0.997,
          batch_tile=tile or None)
      return v

    fn = jax.jit(search_only)
    try:
      out = fn(root.embedding, root.prior_logits, root.value)
      jax.block_until_ready(out)
    except Exception as e:
      print(f"tile={tile or 'auto'}: FAILED {type(e).__name__}: {str(e)[:120]}")
      continue
    # throughput: chain via a data dependency so calls can't be elided
    emb = root.embedding
    t0 = time.time()
    for _ in range(args.iters):
      out = fn(emb, root.prior_logits, root.value)
      emb = emb + 0.0 * out[:, :1]  # depend on out, keep shape
    jax.block_until_ready(out)
    dt = (time.time() - t0) / args.iters
    # latency: block each call
    t0 = time.time()
    for _ in range(5):
      jax.block_until_ready(fn(root.embedding, root.prior_logits, root.value))
    lat = (time.time() - t0) / 5
    print(f"tile={tile or 'auto':>5} throughput={dt*1e3:8.3f} ms/call "
          f"latency={lat*1e3:8.3f} ms  -> {B/dt:,.0f} searches/s")


if __name__ == "__main__":
  main()
