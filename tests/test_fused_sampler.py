"""Fused replay sampler + raw-input learner kernel (Pallas interpret mode
on the CPU conftest): window extraction pinned against direct indexing,
raw-kernel gradients pinned against the prep-path kernel and jax.grad, and
the full fused multi_update driven end-to-end via the CPU test seam."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muax_tpu.config import MuZeroConfig, ReplayConfig, SearchConfig, TrainConfig
from muax_tpu.models import make_mlp_networks
from muax_tpu.replay.buffer import replay_add, replay_init
from muax_tpu.replay.fused_sampler import (draw_segments, fused_sample_group,
                                           make_raw_layout, transpose_ring)
from muax_tpu.types import Transition


def make_filled_replay(rng, C=16, L=8, O=4, A=2, filled=12):
  ks = jax.random.split(rng, 6)
  state = replay_init(C, L, (O,), A)
  segs = Transition(
      obs=jax.random.normal(ks[0], (filled, L, O)),
      action=jax.random.randint(ks[1], (filled, L), 0, A),
      reward=jax.random.uniform(ks[2], (filled, L)),
      done=jax.random.uniform(ks[3], (filled, L)) < 0.15,
      rn=jax.random.uniform(ks[4], (filled, L)) * 4 - 2,
      value=jnp.zeros((filled, L)),
      pi=jax.nn.softmax(jax.random.normal(ks[5], (filled, L, A)), -1),
      weight=jnp.ones((filled,)),
      mask=jnp.ones((filled, L)),
  )
  prios = jax.random.uniform(jax.random.PRNGKey(7), (filled, L)) + 0.1
  return replay_add(state, segs, prios)


class TestFusedSampleGroup:

  def test_extraction_matches_direct_indexing(self):
    K, W = 3, 128
    rs = make_filled_replay(jax.random.PRNGKey(0))
    C, L = rs.capacity, rs.segment_length
    seg_idx = jax.random.randint(jax.random.PRNGKey(1), (W,), 0, 12)
    gum_rng = jax.random.PRNGKey(2)
    raw, lay = fused_sample_group(transpose_ring(rs), rs.step_priorities,
                                  rs.target_step, seg_idx, gum_rng, K,
                                  interpret=True)
    raw = np.asarray(raw)

    # Replicate the in-kernel start draw exactly.
    gumbel = np.asarray(jax.random.gumbel(gum_rng, (L, W), jnp.float32))
    prios = np.asarray(rs.step_priorities)
    num_starts = L - K + 1
    seg = np.asarray(seg_idx)
    logits = np.log(prios[seg].T + 1e-9) + gumbel       # [L, W]
    logits[num_starts:] = -np.inf
    starts = np.argmax(logits, axis=0)                   # ties -> first

    np.testing.assert_array_equal(raw[lay.start], starts.astype(np.float32))
    obs = np.asarray(rs.obs)
    act = np.asarray(rs.action)
    rew = np.asarray(rs.reward)
    rn = np.asarray(rs.rn)
    pi = np.asarray(rs.pi)
    done = np.asarray(rs.done)
    for w in [0, 1, 17, 127]:
      s, st = seg[w], starts[w]
      np.testing.assert_allclose(raw[lay.obs:lay.obs + 4, w],
                                 obs[s, st], rtol=1e-6)
      for j in range(K):
        assert raw[lay.action + j, w] == act[s, st + j]
        np.testing.assert_allclose(raw[lay.reward + j, w], rew[s, st + j],
                                   rtol=1e-6)
        np.testing.assert_allclose(raw[lay.rn + j, w], rn[s, st + j],
                                   rtol=1e-6)
        np.testing.assert_allclose(raw[lay.pi + j * 2:lay.pi + j * 2 + 2, w],
                                   pi[s, st + j], rtol=1e-6)
      # Validity mask: valid until (inclusive) the first done.
      before = 0
      for j in range(K):
        assert raw[lay.mask + j, w] == (1.0 if before == 0 else 0.0)
        before += int(done[s, st + j])
      np.testing.assert_allclose(raw[lay.weight, w], prios[s, st], rtol=1e-6)
      expect_denom = max(raw[lay.mask:lay.mask + K, w].sum(), 1.0)
      assert raw[lay.denom, w] == expect_denom

  def test_draw_segments_matches_replay_sample_level1(self):
    """draw_segments + the kernel's start draw give the same marginal over
    segments as replay_sample's level 1 (identical code path)."""
    rs = make_filled_replay(jax.random.PRNGKey(0))
    seg = draw_segments(rs, jax.random.PRNGKey(3), 4096,
                        offline_fraction=0.5, online_queue_size=4)
    seg = np.asarray(seg)
    assert seg.shape == (4096,)
    assert np.all(seg < 12)  # only filled slots
    # Online tail: last half comes from the 4 newest slots (cursor=12).
    assert set(seg[2048:]) <= {8, 9, 10, 11}


class TestRawGradParity:

  def _setup(self, K=5):
    networks = make_mlp_networks(2, embedding_dim=8, support_size=20)
    params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    rs = make_filled_replay(jax.random.PRNGKey(1), C=32, L=8, filled=24)
    W = 256
    seg_idx = jax.random.randint(jax.random.PRNGKey(2), (W,), 0, 24)
    raw, lay = fused_sample_group(transpose_ring(rs), rs.step_priorities,
                                  rs.target_step, seg_idx,
                                  jax.random.PRNGKey(3), K, interpret=True)
    return networks, params, rs, raw, lay, seg_idx

  def test_raw_kernel_matches_jax_grad(self):
    from muax_tpu.models.fused_learner import (extract_learner_weights,
                                               fused_muzero_grad_raw)
    from muax_tpu.models.losses import muzero_loss
    networks, params, rs, raw, lay, seg_idx = self._setup()
    K = lay.K
    W = raw.shape[1]
    w_raw = raw[lay.weight]
    denom = raw[lay.denom]
    weight = w_raw / jnp.maximum(jnp.mean(w_raw), 1e-9)
    coef = weight / denom / W

    lw = extract_learner_weights(networks, params)
    grads, metrics = fused_muzero_grad_raw(
        params, raw, coef, lay, networks, lw, interpret=True)

    # The equivalent Transition batch by direct indexing.
    starts = raw[lay.start].astype(jnp.int32)
    win = starts[:, None] + jnp.arange(K)[None, :]
    seg2 = seg_idx[:, None]
    batch = Transition(
        obs=rs.obs[seg2, win], action=rs.action[seg2, win],
        reward=rs.reward[seg2, win], done=rs.done[seg2, win],
        rn=rs.rn[seg2, win], value=rs.value[seg2, win],
        pi=rs.pi[seg2, win], weight=weight,
        mask=raw[lay.mask:lay.mask + K].T)
    (ref_loss, ref_metrics), ref_grads = jax.value_and_grad(
        lambda p: muzero_loss(p, batch, networks), has_aux=True)(params)

    np.testing.assert_allclose(float(metrics.total), float(ref_loss),
                               rtol=2e-5)
    for a, b in zip(jax.tree.leaves(grads)[:-1],
                    jax.tree.leaves(ref_grads)[:-1]):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                 atol=1e-7)
    np.testing.assert_allclose(np.asarray(metrics.priorities),
                               np.asarray(ref_metrics.priorities), rtol=1e-4)

  def test_two_hot_targets_match_scalar_to_support(self):
    """The in-kernel h-transform two-hot equals ops.scalar_to_support,
    including the clip boundary."""
    from muax_tpu.models.fused_learner import (extract_learner_weights,
                                               fused_muzero_grad,
                                               fused_muzero_grad_raw)
    networks, params, rs, raw, lay, seg_idx = self._setup()
    # Poison one rn row to the clip boundary value.
    raw = raw.at[lay.rn, :8].set(1e6)
    lw = extract_learner_weights(networks, params)
    w_raw = raw[lay.weight]
    coef = (w_raw / jnp.maximum(jnp.mean(w_raw), 1e-9)) / raw[lay.denom] / \
        raw.shape[1]
    grads, metrics = fused_muzero_grad_raw(
        params, raw, coef, lay, networks, lw, interpret=True)
    assert np.isfinite(float(metrics.total))
    assert np.all(np.isfinite(np.asarray(jax.tree.leaves(grads)[0])))


class TestFusedMultiUpdate:

  def _config(self):
    return MuZeroConfig(
        search=SearchConfig(num_simulations=2),
        replay=ReplayConfig(capacity=32, min_fill=4, offline_fraction=0.5,
                            online_queue_size=8),
        train=TrainConfig(num_envs=4, collect_steps=8, batch_size=64,
                          unroll_steps=3, updates_per_iteration=4,
                          presample_updates=2))

  def test_fused_path_trains_and_refreshes(self, monkeypatch):
    import muax_tpu.train.learner as learner_mod
    from muax_tpu.models import create_optimizer
    monkeypatch.setattr(learner_mod, "_ALLOW_FUSED_SAMPLER_ON_CPU", True)
    config = self._config()
    networks = make_mlp_networks(2, embedding_dim=8, support_size=20)
    params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    opt = create_optimizer("adam", lr=1e-3)
    ts = learner_mod.TrainState(params=params, opt_state=opt.init(params),
                                step=jnp.asarray(0, jnp.int32))
    rs = make_filled_replay(jax.random.PRNGKey(1), C=32, L=8, filled=24)
    mu = learner_mod.make_multi_update_fn(networks, opt, config)
    new_ts, new_rs, metrics = mu(ts, rs, jax.random.PRNGKey(2))
    assert int(new_ts.step) == 4
    assert int(metrics["updates_done"]) == 4
    assert np.isfinite(float(metrics["loss"]))
    assert not np.allclose(np.asarray(new_rs.step_priorities),
                           np.asarray(rs.step_priorities))
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        ts.params.representation,
                        new_ts.params.representation)
    assert max(jax.tree.leaves(diff)) > 0

  @pytest.mark.parametrize("allowed,expected", [(0, 0), (3, 3), (9, 4)])
  def test_spi_gating_on_fused_path(self, monkeypatch, allowed, expected):
    import muax_tpu.train.learner as learner_mod
    from muax_tpu.models import create_optimizer
    monkeypatch.setattr(learner_mod, "_ALLOW_FUSED_SAMPLER_ON_CPU", True)
    config = self._config()
    networks = make_mlp_networks(2, embedding_dim=8, support_size=20)
    params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    opt = create_optimizer("adam", lr=1e-3)
    ts = learner_mod.TrainState(params=params, opt_state=opt.init(params),
                                step=jnp.asarray(0, jnp.int32))
    rs = make_filled_replay(jax.random.PRNGKey(1), C=32, L=8, filled=24)
    mu = learner_mod.make_multi_update_fn(networks, opt, config)
    new_ts, _, metrics = mu(ts, rs, jax.random.PRNGKey(2),
                            jnp.asarray(allowed, jnp.int32))
    assert int(new_ts.step) == expected
    assert int(metrics["updates_done"]) == expected

  def test_online_rows_interleave_across_chunks(self):
    """With the contiguous-chunk permutation, each chunk's lane block gets
    its proportional share of online-queue rows (draw_segments puts the
    online draws in the LAST num_online mega-rows; perm[q] is the original
    mega-row landing at lane q)."""
    group, B = 4, 64
    W = group * B
    num_online = W // 2
    p = np.arange(W)
    perm = (p % B) * group + p // B
    for g in range(group):
      originals = perm[g * B:(g + 1) * B]
      online = (originals >= W - num_online).sum()
      assert online == num_online // group


class TestPerStepObsAndHybrid:
  """per_step_obs extraction + the hybrid mode (fused sampler feeding the
  XLA grad step for families without a raw kernel — VERDICT r4 item 4's
  SMZ treatment, which also covers fc-resnet)."""

  def test_per_step_obs_matches_direct_indexing(self):
    K, W = 3, 128
    rs = make_filled_replay(jax.random.PRNGKey(0))
    seg_idx = jax.random.randint(jax.random.PRNGKey(1), (W,), 0, 12)
    gum_rng = jax.random.PRNGKey(2)
    raw, lay = fused_sample_group(transpose_ring(rs), rs.step_priorities,
                                  rs.target_step, seg_idx, gum_rng, K,
                                  interpret=True, per_step_obs=True)
    raw = np.asarray(raw)
    starts = raw[lay.start].astype(np.int32)
    obs = np.asarray(rs.obs)
    seg = np.asarray(seg_idx)
    O = lay.O
    for w in [0, 7, 63, 127]:
      for f in range(O):
        for j in range(K):
          assert raw[lay.obs + f * K + j, w] == pytest.approx(
              obs[seg[w], starts[w] + j, f], abs=1e-6)

  def test_tstep_row_survives_padding(self):
    # r4 zero-filled from denom+1, overwriting the tstep row — the fused
    # path's staleness metric silently read `step - 0`.
    K, W = 3, 128
    rs = make_filled_replay(jax.random.PRNGKey(0))
    rs = rs.replace(target_step=jnp.arange(rs.capacity, dtype=jnp.int32))
    seg_idx = jax.random.randint(jax.random.PRNGKey(1), (W,), 0, 12)
    raw, lay = fused_sample_group(transpose_ring(rs), rs.step_priorities,
                                  rs.target_step, seg_idx,
                                  jax.random.PRNGKey(2), K, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(raw)[lay.tstep], np.asarray(seg_idx, np.float32))

  def _uniform_stochastic_setup(self, fused_sampler):
    from muax_tpu.models import make_stochastic_mlp_networks
    import optax
    from muax_tpu.train.learner import TrainState, make_multi_update_fn
    L = 8
    config = MuZeroConfig(
        search=SearchConfig(policy="stochastic", num_simulations=4),
        replay=ReplayConfig(capacity=16, min_fill=4),
        train=TrainConfig(num_envs=8, collect_steps=L, batch_size=128,
                          updates_per_iteration=1, unroll_steps=3,
                          n_bootstrap=4, presample_updates=1,
                          fused_sampler=fused_sampler))
    networks = make_stochastic_mlp_networks(2, num_chance_outcomes=4,
                                            embedding_dim=8, support_size=5)
    params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    opt = optax.sgd(1e-2)
    ts = TrainState(params=params, opt_state=opt.init(params),
                    step=jnp.asarray(0, jnp.int32))
    # Window-invariant replay: segments constant in time, uniform
    # priorities -> every drawn window is identical, so the fused and XLA
    # samplers (different RNG streams) must yield identical batches.
    K = 16
    segs = Transition(
        obs=jnp.full((K, L, 4), 0.3),
        action=jnp.ones((K, L), jnp.int32),
        reward=jnp.full((K, L), 0.25),
        done=jnp.zeros((K, L), bool),
        rn=jnp.full((K, L), 0.5),
        value=jnp.zeros((K, L)),
        pi=jnp.full((K, L, 2), 0.5),
        weight=jnp.ones((K,)),
        mask=jnp.ones((K, L)))
    rs = replay_add(replay_init(16, L, (4,), 2), segs, jnp.ones((K, L)))
    mu = make_multi_update_fn(networks, opt, config)
    return mu, ts, rs

  def test_hybrid_mode_engages_for_stochastic(self, monkeypatch):
    import muax_tpu.train.learner as learner_mod
    monkeypatch.setattr(learner_mod, "_ALLOW_FUSED_SAMPLER_ON_CPU", True)
    mu, ts, rs = self._uniform_stochastic_setup(True)
    mode, lw, reason = mu.fused_group_status(ts, rs)
    assert mode == "hybrid" and lw is None, reason

  def test_hybrid_matches_xla_path_on_uniform_replay(self, monkeypatch):
    import muax_tpu.train.learner as learner_mod
    monkeypatch.setattr(learner_mod, "_ALLOW_FUSED_SAMPLER_ON_CPU", True)
    mu_f, ts, rs = self._uniform_stochastic_setup(True)
    mu_x, _, _ = self._uniform_stochastic_setup(False)
    ts_f, rs_f, m_f = mu_f(ts, rs, jax.random.PRNGKey(3))
    ts_x, rs_x, m_x = mu_x(ts, rs, jax.random.PRNGKey(9))
    for a, b in zip(jax.tree.leaves(ts_f.params),
                    jax.tree.leaves(ts_x.params)):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                 atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(float(m_f["loss"]), float(m_x["loss"]),
                               rtol=1e-4)
