"""Replay-regime parity with the reference's acme path: online/offline
table mix (acme/jax/muzero/config.py:61-66, builder.py:189-230),
samples-per-insert rate gating (builder.py:128-187), and weighted
within-trajectory window starts (muax/replay_buffer.py:73-110)."""
import jax
import jax.numpy as jnp
import numpy as np

from muax_tpu.config import MuZeroConfig, ReplayConfig, SearchConfig, TrainConfig
from muax_tpu.replay import replay_add, replay_init, replay_sample
from muax_tpu.replay.tracer import PNStep, Trajectory, TrajectoryReplayBuffer
from muax_tpu.types import Transition

from test_replay import make_segments


class TestOnlineOfflineMix:

  def _filled_state(self):
    """64-slot ring; slot 0 gets ALL the priority, slots written last are
    the online queue contents."""
    state = replay_init(64, 4, (4,), 2)
    prios = jnp.full((64, 4), 1e-6).at[0].set(100.0)
    state = replay_add(state, make_segments(64, 4), prios)
    return state

  def test_pure_offline_follows_priority(self):
    state = self._filled_state()
    _, seg_idx, _ = replay_sample(state, jax.random.PRNGKey(0), 256, 2,
                                  offline_fraction=1.0)
    # Essentially every draw lands on the lone high-priority slot.
    assert np.mean(np.asarray(seg_idx) == 0) > 0.95

  def test_mix_routes_online_rows_to_ring_tail(self):
    state = self._filled_state()  # cursor wrapped to 0 after 64 adds
    batch, seg_idx, _ = replay_sample(state, jax.random.PRNGKey(1), 256, 2,
                                      offline_fraction=0.5,
                                      online_queue_size=8)
    seg_idx = np.asarray(seg_idx)
    offline_rows, online_rows = seg_idx[:128], seg_idx[128:]
    # Offline half still follows priority.
    assert np.mean(offline_rows == 0) > 0.9
    # Online half is uniform over the 8 newest slots (56..63), regardless
    # of their (vanishing) priority.
    assert set(online_rows.tolist()) <= set(range(56, 64))
    counts = np.bincount(online_rows - 56, minlength=8)
    assert counts.min() > 0  # all queue slots reachable

  def test_online_region_respects_partial_fill(self):
    state = replay_init(64, 4, (4,), 2)
    state = replay_add(state, make_segments(5, 4), jnp.full((5, 4), 1.0))
    _, seg_idx, _ = replay_sample(state, jax.random.PRNGKey(2), 64, 2,
                                  offline_fraction=0.5,
                                  online_queue_size=32)
    # Only 5 segments exist; the online rows must stay within them.
    assert set(np.asarray(seg_idx)[32:].tolist()) <= {0, 1, 2, 3, 4}


class TestSamplesPerInsertGate:

  def _setup(self, spi=None):
    from muax_tpu.models import make_mlp_networks, muzero_optimizer
    from muax_tpu.train.learner import TrainState, make_multi_update_fn

    config = MuZeroConfig(
        search=SearchConfig(num_simulations=4),
        replay=ReplayConfig(capacity=32, min_fill=4),
        train=TrainConfig(num_envs=4, collect_steps=4, batch_size=8,
                          updates_per_iteration=4, unroll_steps=2,
                          n_bootstrap=2, samples_per_insert=spi))
    networks = make_mlp_networks(num_actions=2, embedding_dim=4,
                                 support_size=5)
    optimizer = muzero_optimizer()
    params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    ts = TrainState(params=params, opt_state=optimizer.init(params),
                    step=jnp.asarray(0, jnp.int32))
    rs = replay_init(32, 4, (4,), 2)
    rs = replay_add(rs, make_segments(16, 4), jnp.ones((16, 4)))
    multi = jax.jit(make_multi_update_fn(networks, optimizer, config))
    return ts, rs, multi

  def test_gate_caps_updates(self):
    ts, rs, multi = self._setup()
    ts2, _, metrics = multi(ts, rs, jax.random.PRNGKey(1),
                            jnp.asarray(3, jnp.int32))
    assert int(metrics["updates_done"]) == 3
    assert int(ts2.step) == 3

  def test_gate_zero_is_noop(self):
    ts, rs, multi = self._setup()
    ts2, _, metrics = multi(ts, rs, jax.random.PRNGKey(1),
                            jnp.asarray(0, jnp.int32))
    assert int(metrics["updates_done"]) == 0
    assert int(ts2.step) == 0
    np.testing.assert_allclose(
        np.asarray(ts2.params.prediction["linear"]["w"]),
        np.asarray(ts.params.prediction["linear"]["w"]))

  def test_ungated_runs_all(self):
    ts, rs, multi = self._setup()
    ts2, _, metrics = multi(ts, rs, jax.random.PRNGKey(1), None)
    assert int(metrics["updates_done"]) == 4
    assert int(ts2.step) == 4

  def test_fit_gate_schedule_matches_budget(self):
    """Host-side arithmetic of the fit gate: with spi s, after warm-up W
    steps and k iterations of I steps each, total sampled windows never
    exceed s*(W + k*I)*(1+tol)."""
    spi, tol, batch, upi = 2.0, 0.1, 8, 4
    steps_per_iter = 16
    inserted = 2 * steps_per_iter  # warm-up
    sampled = 0
    for _ in range(20):
      inserted += steps_per_iter
      budget = spi * inserted * (1 + tol)
      allowed = int(np.clip((budget - sampled) // batch, 0, upi))
      sampled += allowed * batch
      assert sampled <= budget
    # The gate tracks the budget closely from below once steady.
    assert sampled >= spi * inserted * 0.8


class TestWeightedWindowStarts:

  def test_starts_follow_step_priority(self):
    # discount=0 makes Rn_t = r_t exactly, so |v - Rn| spikes ONLY at the
    # step holding the wild value (no bootstrap leakage to t-n).
    tracer = PNStep(n=2, discount=0.0, alpha=1.0)
    buffer = TrajectoryReplayBuffer(capacity=4, seed=0, window_alpha=1.0)
    traj = Trajectory()
    for t in range(12):
      v = 50.0 if t == 6 else 0.001
      tracer.add(obs=np.full(3, t, np.float32), action=0, reward=0.0,
                 done=(t == 11), value=v, pi=np.ones(2) / 2)
      while tracer:
        traj.add(tracer.pop())
    buffer.add(traj)

    batch = buffer.sample(num_trajectory=64, sample_per_trajectory=1,
                          k_steps=4)
    starts = np.asarray(batch.obs)[:, 0, 0]  # obs encodes the step index
    # t=6 holds ~all the priority mass among starts 0..8.
    assert np.mean(starts == 6) > 0.9

  def test_uniform_fallback_when_priorities_vanish(self):
    buffer = TrajectoryReplayBuffer(capacity=4, seed=0)
    traj = Trajectory()
    tracer = PNStep(n=2, discount=0.9, alpha=0.5)
    for t in range(8):
      tracer.add(obs=np.full(3, t, np.float32), action=0, reward=0.0,
                 done=(t == 7), value=0.0, pi=np.ones(2) / 2)
      while tracer:
        traj.add(tracer.pop())
    buffer.add(traj)
    batch = buffer.sample(num_trajectory=128, sample_per_trajectory=1,
                          k_steps=4)
    starts = np.asarray(batch.obs)[:, 0, 0]
    # All five possible starts appear.
    assert set(starts.astype(int).tolist()) == {0, 1, 2, 3, 4}


class TestAcmeDefaultsRegime:
  """The shipped reference data regime (VERDICT r2 next #6): acme_defaults
  carries the acme-jax MuZero defaults including the SPI=32
  SampleToInsertRatio limiter (acme/jax/muzero/config.py:30-66), and a
  fit() run under it respects the sample budget."""

  def test_factory_matches_reference_defaults(self):
    from muax_tpu.config import acme_defaults
    cfg = acme_defaults()
    assert cfg.train.samples_per_insert == 32.0
    assert cfg.train.spi_tolerance == 0.1
    assert cfg.train.batch_size == 32
    assert cfg.train.updates_per_iteration == 8
    assert cfg.train.unroll_steps == 5
    assert cfg.train.n_bootstrap == 10
    assert cfg.train.discount == 0.99
    assert cfg.search.num_simulations == 50
    assert cfg.replay.offline_fraction == 0.5
    assert cfg.replay.priority_alpha == 1.0

  def test_fit_under_acme_regime_respects_spi_budget(self):
    from muax_tpu.config import acme_defaults
    from muax_tpu.envs import CartPole
    from muax_tpu.models import create_optimizer, make_mlp_networks
    from muax_tpu.train.fit import fit

    cfg = acme_defaults(num_envs=8, collect_steps=6, batch_size=16,
                        unroll_steps=2, n_bootstrap=3)
    cfg.replay.capacity = 64
    cfg.replay.min_fill = 8
    cfg.search.num_simulations = 2
    nets = make_mlp_networks(2, embedding_dim=4, support_size=5)
    state, results = fit(CartPole(), nets, cfg,
                         create_optimizer("adam", 1e-3), num_iterations=4,
                         eval_every=10, log_every=10, save_best=False,
                         log_fn=lambda s: None)
    inserted = (4 + 1) * 8 * 6  # (iterations + warmup) * envs * steps
    budget = 32.0 * inserted * 1.1
    assert 0 < int(state.step) * cfg.train.batch_size <= budget
