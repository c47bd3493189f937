"""Decompose the fused-sampler group overhead on the chip (r4 follow-up to
profile_learner.py): per presample group of W=65536 windows, what do the
sampler kernel, segment draw, staleness gather, and priority scatter cost?"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from muax_tpu.replay.buffer import replay_add, replay_init, \
    replay_update_priorities
from muax_tpu.replay.fused_sampler import (draw_segments, fused_sample_group,
                                           transpose_ring)
from muax_tpu.types import Transition

C, L, O, A, K = 2048, 20, 4, 2, 5
GROUP, B = 16, 4096
W = GROUP * B


def sync(x):
  return float(jnp.asarray(x).reshape(-1)[0])


def best_of(f, n=3):
  ts = []
  for _ in range(n):
    t0 = time.time()
    f()
    ts.append(time.time() - t0)
  return min(ts)


def main():
  rng = jax.random.PRNGKey(0)
  rs = replay_init(C, L, (O,), A)
  ks = jax.random.split(rng, 6)
  segs = Transition(
      obs=jax.random.normal(ks[0], (C, L, O)),
      action=jax.random.randint(ks[1], (C, L), 0, A),
      reward=jax.random.uniform(ks[2], (C, L)),
      done=jax.random.uniform(ks[3], (C, L)) < 0.05,
      rn=jax.random.uniform(ks[4], (C, L)),
      value=jnp.zeros((C, L)),
      pi=jax.nn.softmax(jax.random.normal(ks[5], (C, L, A)), -1),
      weight=jnp.ones((C,)), mask=jnp.ones((C, L)))
  rs = replay_add(rs, segs, jax.random.uniform(jax.random.PRNGKey(9),
                                               (C, L)) + 0.1)
  results = {}

  # All pieces run N times inside one jit (scan) with one readback: the
  # axon tunnel adds ~30 ms per DISPATCH, so single-call timings are floor
  # noise (memory: tpu-tunnel-fragility).
  N = 20
  ring_t = jax.jit(transpose_ring)(rs)
  seg_fixed = jax.random.randint(jax.random.PRNGKey(1), (W,), 0, C)
  starts_fixed = jax.random.randint(jax.random.PRNGKey(4), (W,), 0,
                                    L - K + 1)

  def loop(body):
    @jax.jit
    def run(*args):
      def step(c, r):
        return c + body(r, *args), ()
      c, _ = jax.lax.scan(step, jnp.float32(0),
                          jax.random.split(jax.random.PRNGKey(5), N))
      return c
    return run

  def measure(name, body, *args):
    run = loop(body)
    print(f"[p] compiling {name}", file=sys.stderr, flush=True)
    sync(run(*args))
    results[name] = round(best_of(lambda: sync(run(*args))) * 1e3 / N, 3)
    print(name, results[name], flush=True)

  measure("sampler_kernel_ms_per_group",
          lambda r, prios: jnp.sum(
              fused_sample_group(ring_t, prios, rs.target_step, seg_fixed,
                                 r, K)[0][-3]),
          rs.step_priorities)
  measure("draw_segments_ms_per_group",
          lambda r, rs_: jnp.sum(draw_segments(
              rs_, r, W, offline_fraction=0.5,
              online_queue_size=1024)).astype(jnp.float32), rs)
  measure("staleness_gather_ms_per_group",
          lambda r, rs_: jnp.mean(
              (5 - rs_.target_step[seg_fixed]).astype(jnp.float32)
              ) + jax.random.uniform(r), rs)
  measure("priority_scatter_ms_per_group",
          lambda r, rs_: jnp.sum(replay_update_priorities(
              rs_, seg_fixed, starts_fixed,
              jax.random.uniform(r, (W,)) + 0.5).step_priorities[0]), rs)
  measure("transpose_ring_ms_per_iter",
          lambda r, rs_: jnp.sum(transpose_ring(
              rs_.replace(cursor=(rs_.cursor + jax.random.randint(
                  r, (), 0, 2)))).obs[0]), rs)
  print(json.dumps(results, indent=1), flush=True)
  with open("/root/repo/scripts/profile_fused_sampler_out.json", "w") as f:
    json.dump(results, f, indent=1)


if __name__ == "__main__":
  main()
