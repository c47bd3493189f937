"""Builder tool: per-component cost of one rollout step at batch B.

Times scans of each component in isolation (20 steps per call, sync once) so
the per-step cost is the in-pipeline throughput number, not blocked latency.
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


def scan_time(fn, carry, steps=20, iters=5):
  """fn: (carry, rng) -> carry. Returns seconds per step."""
  @jax.jit
  def run(carry, rng):
    return jax.lax.scan(lambda c, r: (fn(c, r), ()),
                        carry, jax.random.split(rng, steps))[0]

  rng = jax.random.PRNGKey(0)
  out = run(carry, rng)
  jax.block_until_ready(out)
  t0 = time.time()
  for i in range(iters):
    out = run(out, jax.random.fold_in(rng, i))
  jax.block_until_ready(out)
  return (time.time() - t0) / iters / steps


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--num_envs", type=int, default=4096)
  p.add_argument("--num_simulations", type=int, default=64)
  p.add_argument("--tile", type=int, default=512)
  args = p.parse_args()
  B = args.num_envs

  from muax_tpu.envs import AutoResetWrapper, CartPole
  from muax_tpu.models import make_mlp_networks
  from muax_tpu.search.fused import extract_fused_weights, fused_muzero_search
  from muax_tpu.search.policies import (_add_dirichlet_noise,
                                        _apply_temperature,
                                        _get_logits_from_probs)
  from muax_tpu.train.inference import make_root_fn

  networks = make_mlp_networks(num_actions=2, embedding_dim=8,
                               support_size=20)
  rng = jax.random.PRNGKey(0)
  params = networks.init_params(rng, jnp.zeros((1, 4)))
  weights = extract_fused_weights(networks, params)
  root_fn = make_root_fn(networks)
  env = AutoResetWrapper(CartPole())
  carry0 = env.reset(rng, B)
  obs = carry0.obs
  root = jax.jit(root_fn)(params, obs)

  # 1. root inference chained
  t = scan_time(
      lambda e, r: e + 0.0 * root_fn(params, e).embedding[:, :1], obs)
  print(f"root_fn        : {t*1e3:8.3f} ms/step")

  # 2. dirichlet noise
  def noise_step(p, r):
    return _add_dirichlet_noise(r, p, fraction=0.25, alpha=0.3)
  t = scan_time(noise_step, jax.nn.softmax(root.prior_logits, -1))
  print(f"dirichlet      : {t*1e3:8.3f} ms/step")

  # 3. fused kernel chained
  def search_step(emb, r):
    v, rv, q = fused_muzero_search(
        emb, root.prior_logits, root.value, weights,
        num_simulations=args.num_simulations,
        support_size=networks.support_size, discount=0.997,
        batch_tile=args.tile or None)
    return emb + 0.0 * v[:, :1]
  t = scan_time(search_step, root.embedding)
  print(f"fused_search   : {t*1e3:8.3f} ms/step")

  # 4. action sampling (categorical over visit logits)
  def sample_step(w, r):
    logits = _apply_temperature(_get_logits_from_probs(w), 1.0)
    a = jax.random.categorical(r, logits)
    return w + 0.0 * a[:, None].astype(w.dtype)
  t = scan_time(sample_step, jax.nn.softmax(root.prior_logits, -1))
  print(f"action_sample  : {t*1e3:8.3f} ms/step")

  # 5. env.step
  def env_step(c, r):
    a = jax.random.randint(r, (B,), 0, 2)
    new_c, reward, done, info = env.step(c, a, r)
    return new_c
  t = scan_time(env_step, carry0)
  print(f"env_step       : {t*1e3:8.3f} ms/step")


if __name__ == "__main__":
  main()
