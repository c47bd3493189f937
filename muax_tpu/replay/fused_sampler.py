"""Fused replay sampling: segment gather + window extraction as ONE Pallas
TPU kernel.

Why: at the reference's update density (samples_per_insert=32,
acme/jax/muzero/config.py:63-66) every inserted env step is matched by 32
sampled learner windows, and the r4 profile (scripts/profile_learner.py)
shows the XLA window gather is the single largest learner cost: 12.1 ms per
presample group of 65 536 windows — an XLA gather with [W, K] scattered
per-element indices over 9 ring fields, index-bound at ~250 M elem/s.

This kernel replaces the gather with an MXU one-hot matmul: the whole ring
(transposed, [rows, C] — ~1.8 MB at the flagship config) sits in VMEM, a
[C, T] segment one-hot is built per tile from an iota compare, and ONE
f32 matmul gathers every field of T windows' full segments at once
(~230 MFLOP/tile ≈ 5 µs vs ~1.5 ms of XLA gather for the same tile).
Window-start selection (the level-2 Gumbel draw of replay_sample) and
start-relative window extraction then run in VMEM on the gathered segments.

Scope: rings whose one-hot fits comfortably in VMEM (capacity <= ~8192
segments) and MLP-family observations. The generic ``replay_sample`` stays
the engine for every other path (reanalyze, non-fused families, CPU).

Semantics: identical DISTRIBUTION to ``replay_sample`` level-2 + gather
(same masked log-priority + Gumbel argmax start draw, same validity mask,
same start-step weight), but the RNG stream differs (Gumbel noise is drawn
outside and passed in), so per-seed draws are not bit-equal to the XLA
sampler. Level-1 segment selection stays OUTSIDE (``draw_segments``) so the
online-queue mix and priority CDF semantics are byte-for-byte the XLA
path's.

Raw output row layout (see ``RawLayout``): per window lane, the window's
start observation, per-step actions/rewards/n-step returns, the step-major
policy targets, the validity mask, and four scalar rows (start index,
start-step priority, mask denominator, segment target_step) the caller
turns into importance weights, the priority-refresh scatter, and the
staleness metric.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from muax_tpu.replay.buffer import ReplayState


class RawLayout(NamedTuple):
  """Static row offsets into the [R, W] raw output."""
  O: int            # obs feature rows
  K: int            # unroll steps
  A: int            # actions (pi rows = K * A, step-major)
  obs: int          # rows [obs : obs+obs_rows]
  action: int       # rows [action : action+K]
  reward: int
  rn: int
  pi: int           # rows [pi : pi + K*A], row j*A + a
  mask: int
  start: int        # 1 row
  weight: int       # 1 row — start-step priority (unnormalized)
  denom: int        # 1 row — max(sum(mask), 1)
  tstep: int        # 1 row — segment target_step (staleness ledger)
  rows: int         # total (padded to a multiple of 8)
  # per_step_obs=False: obs rows carry only the WINDOW-START observation
  # (row f) — what the raw-input learner kernel consumes. True: obs at
  # EVERY window step (row f*K + j) so a full [B, K, obs] Transition can
  # be reconstructed — the hybrid path feeding families without a raw
  # kernel (stochastic 5-net, fc-resnet) from the fused sampler.
  per_step_obs: bool = False
  obs_rows: int = 0


def make_raw_layout(obs_features: int, k_steps: int, num_actions: int,
                    per_step_obs: bool = False) -> RawLayout:
  O, K, A = obs_features, k_steps, num_actions
  obs_rows = O * K if per_step_obs else O
  obs = 0
  action = obs + obs_rows
  reward = action + K
  rn = reward + K
  pi = rn + K
  mask = pi + K * A
  start = mask + K
  weight = start + 1
  denom = weight + 1
  tstep = denom + 1
  rows = tstep + 1
  rows = ((rows + 7) // 8) * 8
  return RawLayout(O=O, K=K, A=A, obs=obs, action=action, reward=reward,
                   rn=rn, pi=pi, mask=mask, start=start, weight=weight,
                   denom=denom, tstep=tstep, rows=rows,
                   per_step_obs=per_step_obs, obs_rows=obs_rows)


class RingT(NamedTuple):
  """Ring fields transposed to [rows, C] kernel layout (built once per
  learner call by :func:`transpose_ring`; priorities are NOT here — they
  change between presample groups, so they transpose per group)."""
  obs: jax.Array     # [O * L, C], row f*L + l
  action: jax.Array  # [L, C] f32 (integers exact)
  reward: jax.Array  # [L, C]
  rn: jax.Array      # [L, C]
  pi: jax.Array      # [A * L, C], row a*L + l
  done: jax.Array    # [L, C] f32


def transpose_ring(state: ReplayState) -> RingT:
  C, L = state.capacity, state.segment_length
  obs = state.obs.astype(jnp.float32).reshape(C, L, -1)
  return RingT(
      obs=jnp.transpose(obs, (2, 1, 0)).reshape(-1, C),
      action=state.action.astype(jnp.float32).T,
      reward=state.reward.astype(jnp.float32).T,
      rn=state.rn.astype(jnp.float32).T,
      pi=jnp.transpose(state.pi.astype(jnp.float32), (2, 1, 0)).reshape(-1, C),
      done=state.done.astype(jnp.float32).T,
  )


def draw_segments(state: ReplayState, rng: jax.Array, num: int,
                  offline_fraction: float = 1.0,
                  online_queue_size: int = 0) -> jax.Array:
  """Level-1 segment draw — the exact logic of ``replay_sample``'s first
  stage (priority CDF + online-queue tail mix), kept outside the kernel so
  the two samplers share one implementation of the mix semantics."""
  C = state.capacity
  seg_rng, online_rng = jax.random.split(rng)
  filled = jnp.arange(C) < state.size
  seg_weights = jnp.where(filled, jnp.sum(state.step_priorities, axis=1),
                          0.0)
  cdf = jnp.cumsum(seg_weights)
  u = jax.random.uniform(seg_rng, (num,)) * cdf[-1]
  # searchsorted(cdf, u, 'right') as a fused compare+count: on TPU,
  # jnp.searchsorted lowers to a log2(C)-deep while loop of scattered
  # gathers (measured 7.2 ms per 65k draws over a 2048 CDF,
  # scripts/profile_fused_sampler_out.json); the O(num*C) VPU
  # compare-reduce fuses without materializing and runs ~50x faster.
  seg_idx = jnp.sum((u[:, None] >= cdf[None, :]).astype(jnp.int32), axis=1)
  seg_idx = jnp.clip(seg_idx, 0, C - 1)

  num_online = num - int(round(num * offline_fraction))
  if num_online > 0 and online_queue_size > 0:
    window = jnp.minimum(online_queue_size, state.size)
    offsets = jax.random.randint(online_rng, (num_online,), 1,
                                 jnp.maximum(window, 1) + 1)
    online_idx = (state.cursor - offsets) % C
    seg_idx = seg_idx.at[num - num_online:].set(online_idx)
  return seg_idx


def _make_sampler_kernel(*, C: int, L: int, K: int, O: int, A: int, T: int,
                         layout: RawLayout):
  num_starts = L - K + 1

  def kernel(obs_ref, act_ref, rew_ref, rn_ref, pi_ref, done_ref, prio_ref,
             tstep_ref, seg_ref, gum_ref, out_ref):
    seg = seg_ref[:]                                   # [1, T]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (C, T), 0)
              .astype(jnp.float32) == seg).astype(jnp.float32)

    def gather(ref):
      # [rows, C] x [C, T] -> [rows, T]: the MXU one-hot gather.
      return jax.lax.dot_general(ref[:], onehot, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)

    g_obs = gather(obs_ref)      # [O*L, T]
    g_act = gather(act_ref)      # [L, T]
    g_rew = gather(rew_ref)
    g_rn = gather(rn_ref)
    g_pi = gather(pi_ref)        # [A*L, T]
    g_done = gather(done_ref)
    g_prio = gather(prio_ref)    # [L, T]
    g_tstep = gather(tstep_ref)  # [1, T]

    # Level-2 start draw: Gumbel-argmax over valid starts with
    # log-priority logits (replay_sample semantics; ties -> first index
    # via the min trick).
    srow = (jax.lax.broadcasted_iota(jnp.int32, (L, T), 0)
            .astype(jnp.float32))
    logits = jnp.where(srow < float(num_starts),
                       jnp.log(g_prio + 1e-9) + gum_ref[:], -jnp.inf)
    m = jnp.max(logits, axis=0, keepdims=True)
    start = jnp.min(jnp.where(logits >= m, srow, 3e7), axis=0,
                    keepdims=True)                     # [1, T] f32

    sh = [(start == float(s)).astype(jnp.float32)
          for s in range(num_starts)]                  # [1, T] each

    def at_start(rows, base):
      """sum_s sh[s] * rows[base + s] -> [1, T]."""
      acc = sh[0] * rows[base:base + 1, :]
      for s in range(1, num_starts):
        acc = acc + sh[s] * rows[base + s:base + s + 1, :]
      return acc

    out = [None] * layout.rows

    for f in range(O):
      if layout.per_step_obs:
        for j in range(K):
          out[layout.obs + f * K + j] = at_start(g_obs, f * L + j)
      else:
        out[layout.obs + f] = at_start(g_obs, f * L)
    for j in range(K):
      out[layout.action + j] = at_start(g_act, j)
      out[layout.reward + j] = at_start(g_rew, j)
      out[layout.rn + j] = at_start(g_rn, j)
      for a in range(A):
        out[layout.pi + j * A + a] = at_start(g_pi, a * L + j)

    # Validity mask: step j valid iff no done strictly before j inside the
    # window (_window_validity_mask semantics).
    before = jnp.zeros_like(start)
    denom = jnp.zeros_like(start)
    for j in range(K):
      mask_j = (before == 0.0).astype(jnp.float32)
      out[layout.mask + j] = mask_j
      denom = denom + mask_j
      before = before + at_start(g_done, j)

    out[layout.start] = start
    out[layout.weight] = at_start(g_prio, 0)
    out[layout.denom] = jnp.maximum(denom, 1.0)
    out[layout.tstep] = g_tstep
    # Zero-fill only the PADDING rows. (r4 started this loop at denom+1,
    # which is the tstep row — the staleness ledger row was overwritten
    # with zeros, so the fused path's target_staleness metric read
    # `step - 0`; caught by test_tstep_row_survives_padding.)
    for r in range(layout.tstep + 1, layout.rows):
      out[r] = jnp.zeros_like(start)
    out_ref[:] = jnp.concatenate(out, axis=0)

  return kernel


def fused_sample_group(
    ring_t: RingT,
    step_priorities: jax.Array,   # [C, L] — live (refreshed between groups)
    target_step: jax.Array,       # [C] — staleness ledger (live)
    seg_idx: jax.Array,           # [W] i32 from draw_segments
    rng: jax.Array,               # Gumbel noise key for the start draw
    k_steps: int,
    *,
    lane_tile: int = 512,
    interpret: Optional[bool] = None,
    per_step_obs: bool = False,
) -> tuple[jax.Array, RawLayout]:
  """Gather + window-extract W windows; returns ([R, W] raw, layout)."""
  if interpret is None:
    interpret = jax.default_backend() == "cpu"
  L, C = ring_t.action.shape
  O = ring_t.obs.shape[0] // L
  A = ring_t.pi.shape[0] // L
  W = seg_idx.shape[0]
  K = k_steps
  layout = make_raw_layout(O, K, A, per_step_obs=per_step_obs)

  T = min(lane_tile, W)
  if W % T != 0:
    raise ValueError(f"window count {W} must be a multiple of tile {T}")
  G = W // T

  gumbel = jax.random.gumbel(rng, (L, W), jnp.float32)
  inputs = [ring_t.obs, ring_t.action, ring_t.reward, ring_t.rn, ring_t.pi,
            ring_t.done, step_priorities.astype(jnp.float32).T,
            target_step.astype(jnp.float32)[None, :],
            seg_idx.astype(jnp.float32)[None, :], gumbel]

  kernel = _make_sampler_kernel(C=C, L=L, K=K, O=O, A=A, T=T, layout=layout)

  def col_spec(rows):
    return pl.BlockSpec((rows, T), lambda i: (0, i),
                        memory_space=pltpu.VMEM)

  def const_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

  raw = pl.pallas_call(
      kernel,
      grid=(G,),
      in_specs=[const_spec(ring_t.obs.shape), const_spec((L, C)),
                const_spec((L, C)), const_spec((L, C)),
                const_spec(ring_t.pi.shape), const_spec((L, C)),
                const_spec((L, C)), const_spec((1, C)), col_spec(1),
                col_spec(L)],
      out_specs=col_spec(layout.rows),
      out_shape=jax.ShapeDtypeStruct((layout.rows, W), jnp.float32),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(*inputs)
  return raw, layout
