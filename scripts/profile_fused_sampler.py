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

  # sampler kernel alone (ring transposed outside the timed region)
  ring_t = jax.jit(transpose_ring)(rs)
  seg_fixed = jax.random.randint(jax.random.PRNGKey(1), (W,), 0, C)

  @jax.jit
  def sample_only(prios, seg, r):
    raw, lay = fused_sample_group(ring_t, prios, seg, r, K)
    return jnp.sum(raw[lay.weight])

  print("[p] compiling sample_only", file=sys.stderr, flush=True)
  sync(sample_only(rs.step_priorities, seg_fixed, jax.random.PRNGKey(2)))
  results["sampler_kernel_ms_per_group"] = round(best_of(
      lambda: sync(sample_only(rs.step_priorities, seg_fixed,
                               jax.random.PRNGKey(2)))) * 1e3, 2)
  print(results, flush=True)

  @jax.jit
  def draw_only(rs_, r):
    seg = draw_segments(rs_, r, W, offline_fraction=0.5,
                        online_queue_size=1024)
    return jnp.sum(seg)

  print("[p] compiling draw_only", file=sys.stderr, flush=True)
  sync(draw_only(rs, jax.random.PRNGKey(3)))
  results["draw_segments_ms_per_group"] = round(best_of(
      lambda: sync(draw_only(rs, jax.random.PRNGKey(3)))) * 1e3, 2)
  print(results, flush=True)

  @jax.jit
  def stale_only(rs_, seg):
    return jnp.mean((5 - rs_.target_step[seg]).astype(jnp.float32))

  sync(stale_only(rs, seg_fixed))
  results["staleness_gather_ms_per_group"] = round(best_of(
      lambda: sync(stale_only(rs, seg_fixed))) * 1e3, 2)
  print(results, flush=True)

  starts_fixed = jax.random.randint(jax.random.PRNGKey(4), (W,), 0,
                                    L - K + 1)

  @jax.jit
  def scatter_only(rs_, seg, st):
    rs2 = replay_update_priorities(rs_, seg, st, jnp.ones((W,)))
    return jnp.sum(rs2.step_priorities[0])

  sync(scatter_only(rs, seg_fixed, starts_fixed))
  results["priority_scatter_ms_per_group"] = round(best_of(
      lambda: sync(scatter_only(rs, seg_fixed, starts_fixed))) * 1e3, 2)
  print(results, flush=True)

  # transpose_ring itself (paid once per multi_update call)
  @jax.jit
  def transpose_only(rs_):
    rt = transpose_ring(rs_)
    return jnp.sum(rt.obs[0])

  sync(transpose_only(rs))
  results["transpose_ring_ms_per_iter"] = round(best_of(
      lambda: sync(transpose_only(rs))) * 1e3, 2)
  print(json.dumps(results, indent=1), flush=True)
  with open("/root/repo/scripts/profile_fused_sampler_out.json", "w") as f:
    json.dump(results, f, indent=1)


if __name__ == "__main__":
  main()
