"""The jitted learner: sample -> unrolled loss -> optax -> priority refresh.

Replaces the reference's MZLearner step (acme/jax/muzero/learning.py:269-301)
with a fully on-device update chained directly onto the device replay —
no host iterator, no Reverb round-trip. Data-parallel gradient reduction is
layered on by muax_tpu.parallel (psum over the mesh, replacing
pmap/lax.pmean at learning.py:130-151).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from muax_tpu.config import MuZeroConfig
from muax_tpu.models.losses import muzero_loss
from muax_tpu.models.networks import MZNetworks, MZParams
from muax_tpu.replay.buffer import (
    ReplayState,
    replay_sample,
    replay_update_priorities,
)


class TrainState(NamedTuple):
  """Parity with the reference TrainingState (learning.py:34-40)."""
  params: MZParams
  opt_state: Any
  step: jax.Array


def _make_finish(optimizer: optax.GradientTransformation,
                 axis_name: str | None = None):
  """The shared optax tail of one gradient step: check_numerics -> pmean ->
  optimizer -> apply, preserving the actor temperature."""

  def _finish(train_state, grads, metrics):
    # No-op unless utils.set_check_numerics(True) was called before tracing
    # (the reference's check_numerics guard, tf/mcts/search.py:744-747).
    from muax_tpu.utils.debug import check_numerics
    grads = check_numerics(grads, "grads")
    if axis_name is not None:
      grads = jax.lax.pmean(grads, axis_name)
    updates, opt_state = optimizer.update(grads, train_state.opt_state,
                                          train_state.params)
    new_params = optax.apply_updates(train_state.params, updates)
    # Temperature is actor state, not a learnable weight: restore it.
    new_params = new_params._replace(
        temperature=train_state.params.temperature)
    new_state = TrainState(params=new_params, opt_state=opt_state,
                           step=train_state.step + 1)
    out_metrics = {
        "loss": metrics.total,
        "reward_loss": metrics.reward_loss,
        "value_loss": metrics.value_loss,
        "policy_loss": metrics.policy_loss,
        "l2_loss": metrics.l2_loss,
        "grad_norm": optax.global_norm(grads),
    }
    return new_state, metrics.priorities, out_metrics

  return _finish


def _make_grad_step(networks: MZNetworks,
                    optimizer: optax.GradientTransformation,
                    config: MuZeroConfig, axis_name: str | None = None):
  """(train_state, batch) -> (train_state, priorities [B], metrics): the
  loss + optax core shared by the single-update and grouped paths
  (reference _gradient_step, acme/jax/muzero/learning.py:136-174)."""
  tcfg = config.train
  is_stochastic = hasattr(networks, "chance")
  _finish = _make_finish(optimizer, axis_name)

  def grad_step(train_state: TrainState, batch):
    # Fused Pallas learner for the flagship MLP family on TPU backends:
    # loss + backward as one kernel (models/fused_learner.py; grad parity
    # is test-pinned against jax.grad). Other families and CPU runs use
    # the jax.grad path below — same dispatch policy as the fused search
    # (train/actor.py).
    if (tcfg.fused_learner and not is_stochastic
        and jax.default_backend() != "cpu"):
      from muax_tpu.models.fused_learner import (
          extract_categorical_learner_spec, extract_learner_weights,
          fused_muzero_grad)
      lw = (extract_learner_weights(networks, train_state.params)
            or extract_categorical_learner_spec(networks,
                                                train_state.params))
      if lw is not None:
        grads, metrics = fused_muzero_grad(
            train_state.params, batch, networks, lw,
            l2_coef=tcfg.l2_coef, gradient_scale=tcfg.gradient_scale,
            priority_alpha=config.replay.priority_alpha)
        return _finish(train_state, grads, metrics)

    def loss_fn(params):
      if is_stochastic:
        from muax_tpu.models.stochastic_losses import stochastic_muzero_loss
        return stochastic_muzero_loss(
            params, batch, networks,
            l2_coef=tcfg.l2_coef,
            gradient_scale=tcfg.gradient_scale,
            priority_alpha=config.replay.priority_alpha)
      return muzero_loss(
          params, batch, networks,
          l2_coef=tcfg.l2_coef,
          gradient_scale=tcfg.gradient_scale,
          priority_alpha=config.replay.priority_alpha)

    grads, metrics = jax.grad(loss_fn, has_aux=True)(train_state.params)
    return _finish(train_state, grads, metrics)

  return grad_step


def make_update_fn(networks: MZNetworks, optimizer: optax.GradientTransformation,
                   config: MuZeroConfig, axis_name: str | None = None):
  """Build update(train_state, replay_state, rng) ->
  (train_state, replay_state, metrics). One sampled batch, one grad step."""
  tcfg = config.train
  grad_step = _make_grad_step(networks, optimizer, config, axis_name)

  def update(train_state: TrainState, replay_state: ReplayState,
             rng: jax.Array):
    rng, aug_rng = jax.random.split(rng)
    batch, seg_idx, starts = replay_sample(
        replay_state, rng, tcfg.batch_size, tcfg.unroll_steps,
        offline_fraction=config.replay.offline_fraction,
        online_queue_size=config.replay.online_queue_size)
    if tcfg.observation_transform is not None:
      # Dataset-side image augmentation on the sampled batch only
      # (reference observation_transform, acme/jax/muzero/config.py:69-71
      # applied in make_dataset_iterator, builder.py:194-199). Stored and
      # rollout observations are never touched.
      batch = batch.replace(
          obs=tcfg.observation_transform(aug_rng, batch.obs))

    # How old (in learner steps) the sampled windows' pi/value/rn targets
    # are — the staleness ledger reanalyze burns down (Reanalyze,
    # Schrittwieser et al. 2020 appendix H; stubbed in the reference at
    # acme/jax/muzero/utils.py:25-70).
    staleness = jnp.mean(
        (train_state.step - replay_state.target_step[seg_idx])
        .astype(jnp.float32))
    new_state, priorities, out_metrics = grad_step(train_state, batch)
    replay_state = replay_update_priorities(
        replay_state, seg_idx, starts, priorities + 1e-6)
    out_metrics = {**out_metrics, "target_staleness": staleness}
    return new_state, replay_state, out_metrics

  return update


# Test seam: lets the CPU test suite exercise the fused sampler + raw
# kernel path in Pallas interpret mode (see _fused_group_ok).
_ALLOW_FUSED_SAMPLER_ON_CPU = False


def _gcd(a: int, b: int) -> int:
  while b:
    a, b = b, a % b
  return a


def _interleave_chunks(big, group: int, B: int):
  """[group*B, ...] mega-batch -> [group, B, ...] chunks, COLUMN-major:
  mega-batch row i lands in chunk ``i % group`` at position ``i // group``.

  replay_sample places the online-queue rows in the LAST ``num_online``
  rows of the mega-batch; column-major chunking spreads them evenly across
  the group's batches, so every gradient step sees its proportional
  online/offline mix — matching the reference's flattened dataset read
  (acme/jax/muzero/builder.py:189-230). Row-major chunking would give the
  first chunks all-offline and the last all-online batches (ADVICE r3).
  """
  return jax.tree.map(
      lambda x: jnp.swapaxes(x.reshape((B, group) + x.shape[1:]), 0, 1),
      big)


def _deinterleave_flat(per_chunk: jax.Array, B: int) -> jax.Array:
  """Inverse of :func:`_interleave_chunks` for per-row outputs: a
  [group, B] array (chunk-order) back to a flat [group*B] array in
  mega-batch row order."""
  return jnp.swapaxes(per_chunk, 0, 1).reshape(-1)


def _transition_from_raw(raw_j, lay, obs_shape, weight_j):
  """Reshape a [R, B] fused-sampler raw slice (per_step_obs layout) back
  into the [B, K, ...] Transition the generic losses consume — the
  "hybrid" fast path: kernel gather, XLA gradients.

  ``done``/``value`` are not carried in the raw layout; neither loss
  reads them (validity lives in ``mask``, priorities use ``rn``)."""
  from muax_tpu.types import Transition
  B = raw_j.shape[1]
  K, O, A = lay.K, lay.O, lay.A

  def rows(base, n):
    return jax.lax.dynamic_slice_in_dim(raw_j, base, n, axis=0)

  obs = (rows(lay.obs, O * K).reshape(O, K, B).transpose(2, 1, 0)
         .reshape((B, K) + tuple(obs_shape)))
  pi = rows(lay.pi, K * A).reshape(K, A, B).transpose(2, 0, 1)
  return Transition(
      obs=obs,
      action=rows(lay.action, K).T.astype(jnp.int32),
      reward=rows(lay.reward, K).T,
      done=jnp.zeros((B, K), jnp.bool_),
      rn=rows(lay.rn, K).T,
      value=jnp.zeros((B, K), jnp.float32),
      pi=pi,
      weight=weight_j,
      mask=rows(lay.mask, K).T)


def make_multi_update_fn(networks, optimizer, config: MuZeroConfig,
                         axis_name: str | None = None):
  """N updates per call, presampled in GROUPS (the reference's dataset
  batching: ``gradient_steps_per_learner_step`` batches are fetched in ONE
  dataset read and flattened, acme/jax/muzero/builder.py:189-230 +
  config.py:30-32; priorities refresh once per learner step via the async
  Reverb mutation, learning.py:108-121).

  Grouping is a pure throughput optimization on TPU: one
  ``replay_sample`` of ``group * batch`` windows amortizes the sampler's
  fixed cost (RNG + CDF + argmax) across the group, and the priority
  scatter runs once per group instead of once per update. Semantics match
  the reference: all batches of a group are drawn against the priorities
  as of the group start, and refreshed priorities land before the next
  group samples.

  ``multi_update(..., num_allowed=None)``: when given, only the first
  ``num_allowed`` of the N updates execute (lax.cond skips the rest) — the
  hook the samples-per-insert rate gate in ``fit`` uses to reproduce
  Reverb's SampleToInsertRatio limiter (builder.py:128-187).
  """
  tcfg = config.train
  grad_step = _make_grad_step(networks, optimizer, config, axis_name)
  n = tcfg.updates_per_iteration
  group = _gcd(n, max(1, tcfg.presample_updates))
  num_groups = n // group
  B = tcfg.batch_size

  metric_keys = ("loss", "reward_loss", "value_loss", "policy_loss",
                 "l2_loss", "grad_norm")

  def _fused_group_status(train_state, replay_state):
    """Trace-time dispatch for the fused-sampler grouped learner.

    Returns (mode, learner_weights, reason):
      * mode "raw": fused sampler feeds the raw-input learner KERNEL
        (MLP / acme LayerNormMLP — loss+backward as one Pallas op),
      * mode "hybrid": fused sampler feeds a reconstructed Transition
        into the XLA grad step (families without a raw kernel whose obs
        still fit the VMEM ring: stochastic 5-net, fc-resnet),
      * mode None: the XLA replay_sample path, with the reason string —
        surfaced by ``fused_status`` so a config that silently steps off
        the fast path is visible instead of a quiet 2x regression."""
    if not tcfg.fused_sampler:
      return None, None, "disabled by config (fused_sampler)"
    if tcfg.observation_transform is not None:
      return None, None, "observation_transform runs on the XLA sampled batch"
    if jax.default_backend() == "cpu" and not _ALLOW_FUSED_SAMPLER_ON_CPU:
      # Interpret-mode Pallas is far slower than XLA on CPU; the flag lets
      # tests drive the fused path under the CPU conftest.
      return None, None, "CPU backend (interpret-mode Pallas is slower than XLA)"
    lw = None
    if tcfg.fused_learner and not hasattr(networks, "chance"):
      from muax_tpu.models.fused_learner import (
          extract_categorical_learner_spec, extract_learner_weights)
      lw = (extract_learner_weights(networks, train_state.params)
            or extract_categorical_learner_spec(networks,
                                                train_state.params))
    mode = "raw" if lw is not None else "hybrid"
    C = replay_state.capacity
    L = replay_state.segment_length
    O = 1
    for d in replay_state.obs.shape[2:]:
      O *= d
    A = networks.num_actions
    K = tcfg.unroll_steps
    W = group * B
    T = min(512, W)
    if O > 64:
      return None, None, (f"obs features {O} > 64 "
                          "(conv/pixel rings stay in HBM)")
    if L - K + 1 < 1:
      return None, None, f"unroll {K} exceeds segment length {L}"
    # Pallas tiles lanes in multiples of 128: a W that merely divides the
    # 512-lane tile (e.g. 192) would still compile a misaligned kernel.
    if W % T != 0 or W % 128 != 0:
      return None, None, (f"group*batch {W} not a multiple of 128 "
                          "(lane-tile alignment)")
    if C > 8192:
      return None, None, f"capacity {C} > 8192 segments (kernel design bound)"
    # The ring is const-resident in VMEM: [O*L + A*L + 5L + 1, C] f32 rows
    # (obs, pi, action/reward/rn/done/priorities, target_step) + the
    # per-tile working set (the [C, T] one-hot, gathered rows, raw output,
    # gumbel). The hybrid mode extracts obs at every window step (O*K
    # output rows instead of O). Falling back beats a Pallas
    # VMEM-exhaustion compile error (ADVICE r4).
    obs_out = O * K if mode == "hybrid" else O
    ring_rows = O * L + A * L + 5 * L + 1
    out_rows = obs_out + 3 * K + A * K + K + 4 + 8
    const_bytes = ring_rows * C * 4
    tile_bytes = (C + ring_rows + 2 * out_rows + L + 1) * T * 4
    budget = 80 * 1024 * 1024
    if const_bytes + tile_bytes > budget:
      return None, None, (f"ring + tile VMEM estimate "
                          f"{(const_bytes + tile_bytes) >> 20} MB > "
                          f"{budget >> 20} MB budget (capacity {C}, "
                          f"obs {O}, actions {A})")
    return mode, lw, f"active ({mode})"

  def _fused_group_ok(train_state, replay_state):
    return _fused_group_status(train_state, replay_state)[0]

  def _fused_multi_update(train_state, replay_state, rng, num_allowed,
                          mode, lw):
    """The fused-sampler grouped learner: per group, ONE Pallas sampler
    kernel gathers+extracts group*B windows from the VMEM-resident ring
    (replay/fused_sampler.py). In mode "raw" the scan body is a single
    raw-input gradient kernel + the optax tail — no per-update gather,
    one_hot, support transform, or transpose. In mode "hybrid" the raw
    rows are reshaped back into a [B, K, ...] Transition (cheap XLA
    transposes) and fed to the generic grad step — families without a
    raw kernel (stochastic 5-net, fc-resnet) still skip the expensive
    XLA window gather. Semantics match the XLA grouped path
    (online/offline interleave, SPI gating, group-cadence priority
    refresh); only the sampling RNG stream differs (documented in
    fused_sampler.py)."""
    from muax_tpu.models.fused_learner import (
        extract_categorical_learner_spec, extract_learner_weights,
        fused_muzero_grad_raw)
    from muax_tpu.replay.fused_sampler import (draw_segments,
                                               fused_sample_group,
                                               transpose_ring)
    _finish = _make_finish(optimizer, axis_name)
    W = group * B
    K = tcfg.unroll_steps
    obs_shape = replay_state.obs.shape[2:]
    # Chunk g = contiguous lanes [g*B, (g+1)*B); this permutation gives it
    # the interleaved content assignment (mega-row i -> chunk i % group),
    # so every gradient step sees its proportional online/offline mix —
    # same semantics as _interleave_chunks, by construction.
    p = jnp.arange(W)
    perm = (p % B) * group + p // B
    ring_t = transpose_ring(replay_state)

    def group_body(carry, xs):
      g, rng_g = xs
      ts, rs = carry
      seg_rng, gum_rng = jax.random.split(rng_g)
      seg_idx = draw_segments(
          rs, seg_rng, W, offline_fraction=config.replay.offline_fraction,
          online_queue_size=config.replay.online_queue_size)[perm]
      raw, lay = fused_sample_group(ring_t, rs.step_priorities,
                                    rs.target_step, seg_idx, gum_rng, K,
                                    per_step_obs=(mode == "hybrid"))
      starts = raw[lay.start].astype(jnp.int32)
      w_raw = raw[lay.weight]
      denom = raw[lay.denom]
      weight = w_raw / jnp.maximum(jnp.mean(w_raw), 1e-9)
      coef = weight / denom / B
      # Staleness from the kernel-gathered target_step row (a [W] XLA
      # gather here measured 2.2 ms/group; the kernel row is free).
      staleness = ts.step.astype(jnp.float32) - jnp.mean(raw[lay.tstep])

      def run_one(ts_c, j):
        raw_j = jax.lax.dynamic_slice_in_dim(raw, j * B, B, axis=1)
        if mode == "hybrid":
          weight_j = jax.lax.dynamic_slice_in_dim(weight, j * B, B, axis=0)
          batch_j = _transition_from_raw(raw_j, lay, obs_shape, weight_j)
          return grad_step(ts_c, batch_j)
        coef_j = jax.lax.dynamic_slice_in_dim(coef, j * B, B, axis=0)
        lw_c = (extract_learner_weights(networks, ts_c.params)
                or extract_categorical_learner_spec(networks, ts_c.params))
        grads, metrics = fused_muzero_grad_raw(
            ts_c.params, raw_j, coef_j, lay, networks, lw_c,
            l2_coef=tcfg.l2_coef, gradient_scale=tcfg.gradient_scale,
            priority_alpha=config.replay.priority_alpha)
        return _finish(ts_c, grads, metrics)

      def upd_body(ts_c, j):
        if num_allowed is None:
          ts_c, prios, metrics = run_one(ts_c, j)
          executed = jnp.float32(1.0)
        else:
          executed_b = g * group + j < num_allowed

          def run(ts_in):
            return run_one(ts_in, j)

          def skip(ts_in):
            zero = {k: jnp.float32(0.0) for k in metric_keys}
            return ts_in, jnp.zeros((B,)), zero

          executed = executed_b.astype(jnp.float32)
          ts_c, prios, metrics = jax.lax.cond(executed_b, run, skip, ts_c)
        return ts_c, ({**metrics, "updates_done": executed},
                      prios, executed)

      ts, (metrics, prios, executed) = jax.lax.scan(
          upd_body, ts, jnp.arange(group))

      # Group-cadence priority refresh (same as the XLA path). prios is
      # [group, B] with chunk g contiguous — reshape(-1) IS mega-batch
      # lane order here (no de-interleave: the permutation above already
      # made chunks contiguous).
      flat_prios = prios.reshape(-1) + 1e-6
      current = rs.step_priorities[seg_idx, starts]
      keep_mask = jnp.repeat(executed, B) > 0
      rs = replay_update_priorities(
          rs, seg_idx, starts, jnp.where(keep_mask, flat_prios, current))
      metrics = {**metrics, "target_staleness":
                 jnp.full((group,), staleness) * metrics["updates_done"]}
      return (ts, rs), metrics

    xs = (jnp.arange(num_groups), jax.random.split(rng, num_groups))
    (train_state, replay_state), metrics = jax.lax.scan(
        group_body, (train_state, replay_state), xs)
    done = jnp.maximum(jnp.sum(metrics["updates_done"]), 1.0)
    mean_metrics = {
        k: (jnp.sum(v) / done if k != "updates_done" else jnp.sum(v))
        for k, v in metrics.items()}
    return train_state, replay_state, mean_metrics

  def multi_update(train_state: TrainState, replay_state: ReplayState,
                   rng: jax.Array, num_allowed=None):
    mode, lw, _ = _fused_group_status(train_state, replay_state)
    if mode is not None:
      return _fused_multi_update(train_state, replay_state, rng,
                                 num_allowed, mode, lw)
    def group_body(carry, xs):
      g, rng_g = xs
      ts, rs = carry
      sample_rng, aug_rng, upd_rng = jax.random.split(rng_g, 3)
      big, seg_idx, starts = replay_sample(
          rs, sample_rng, group * B, tcfg.unroll_steps,
          offline_fraction=config.replay.offline_fraction,
          online_queue_size=config.replay.online_queue_size)
      if tcfg.observation_transform is not None:
        # Dataset-side augmentation on the sampled batch only (reference
        # observation_transform, acme/jax/muzero/config.py:69-71 applied in
        # make_dataset_iterator, builder.py:194-199). Stored and rollout
        # observations are never touched.
        big = big.replace(obs=tcfg.observation_transform(aug_rng, big.obs))
      chunks = _interleave_chunks(big, group, B)
      staleness = jnp.mean(
          (ts.step - rs.target_step[seg_idx]).astype(jnp.float32))

      def upd_body(ts_c, xs2):
        j, batch_j = xs2
        if num_allowed is None:
          ts_c, prios, metrics = grad_step(ts_c, batch_j)
          executed = jnp.float32(1.0)
        else:
          executed_b = g * group + j < num_allowed

          def run(ts_in):
            return grad_step(ts_in, batch_j)

          def skip(ts_in):
            zero = {k: jnp.float32(0.0) for k in metric_keys}
            return ts_in, jnp.zeros((B,)), zero

          executed = executed_b.astype(jnp.float32)
          ts_c, prios, metrics = jax.lax.cond(executed_b, run, skip, ts_c)
        return ts_c, ({**metrics, "updates_done": executed},
                      prios, executed)

      ts, (metrics, prios, executed) = jax.lax.scan(
          upd_body, ts, (jnp.arange(group), chunks))

      # One in-place priority refresh per group (the async Reverb mutation
      # cadence, learning.py:108-121). Windows drawn twice within a group
      # keep an unspecified winner — the same race the reference's async
      # mutations have. prios is [group, B] in chunk order; de-interleave
      # back to mega-batch row order to line up with seg_idx/starts.
      flat_prios = _deinterleave_flat(prios, B) + 1e-6
      current = rs.step_priorities[seg_idx, starts]
      keep_mask = _deinterleave_flat(
          jnp.broadcast_to(executed[:, None], (group, B)), B) > 0
      rs = replay_update_priorities(
          rs, seg_idx, starts, jnp.where(keep_mask, flat_prios, current))
      metrics = {**metrics, "target_staleness":
                 jnp.full((group,), staleness) * metrics["updates_done"]}
      return (ts, rs), metrics

    xs = (jnp.arange(num_groups), jax.random.split(rng, num_groups))
    (train_state, replay_state), metrics = jax.lax.scan(
        group_body, (train_state, replay_state), xs)
    done = jnp.maximum(jnp.sum(metrics["updates_done"]), 1.0)
    mean_metrics = {
        k: (jnp.sum(v) / done if k != "updates_done" else jnp.sum(v))
        for k, v in metrics.items()}
    return train_state, replay_state, mean_metrics

  # Introspection seam for muax_tpu.fused_status: report whether this
  # learner will take the fused sampler + raw-kernel path and why (not).
  multi_update.fused_group_status = _fused_group_status
  return multi_update
