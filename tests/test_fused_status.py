"""fused_status: the fast-path applicability report (VERDICT r4 item 7).

The report must reuse the learner's real dispatch gate (no drift), surface
WHY a path is off, and catch the configs that silently step off the fused
sampler (conv observations, oversized rings, misaligned group*batch).
"""
import jax
import jax.numpy as jnp
import pytest

from muax_tpu.config import MuZeroConfig, ReplayConfig, SearchConfig, TrainConfig
from muax_tpu.fused_status import format_fused_status, fused_status
from muax_tpu.models import make_efficientzero_networks, make_mlp_networks
from muax_tpu.replay.buffer import replay_init


def _mlp_setup(capacity=512, batch_size=128, presample=8, obs=(4,)):
  config = MuZeroConfig(
      search=SearchConfig(policy="muzero", num_simulations=8),
      replay=ReplayConfig(capacity=capacity, min_fill=8),
      train=TrainConfig(num_envs=8, collect_steps=10, batch_size=batch_size,
                        updates_per_iteration=8, unroll_steps=5,
                        presample_updates=presample))
  networks = make_mlp_networks(num_actions=2, embedding_dim=8,
                               support_size=10)
  params = networks.init_params(jax.random.PRNGKey(0),
                                jnp.zeros((1,) + obs))
  rs = replay_init(capacity, 10, obs, 2)
  return networks, config, params, rs


class TestFusedStatus:

  def test_cpu_backend_reports_off_with_reasons(self):
    networks, config, params, rs = _mlp_setup()
    report = fused_status(networks, config, params, rs)
    assert set(report) == {"fused_search", "fused_learner", "fused_sampler"}
    # The CPU conftest backend keeps every compiled path off — but each
    # entry must say WHY, and the reason must name the backend.
    for entry in report.values():
      assert not entry["active"]
      assert "CPU" in entry["reason"] or "cpu" in entry["reason"]

  def test_sampler_gate_names_conv_obs(self, monkeypatch):
    import muax_tpu.train.learner as learner_mod
    monkeypatch.setattr(learner_mod, "_ALLOW_FUSED_SAMPLER_ON_CPU", True)
    config = MuZeroConfig(
        search=SearchConfig(policy="muzero", num_simulations=8),
        replay=ReplayConfig(capacity=256, min_fill=8),
        train=TrainConfig(num_envs=8, collect_steps=10, batch_size=128,
                          updates_per_iteration=8, unroll_steps=5))
    networks = make_efficientzero_networks(num_actions=3, support_size=10,
                                           channels=8, num_blocks=1)
    obs = (16, 16, 1)
    params = networks.init_params(jax.random.PRNGKey(0),
                                  jnp.zeros((1,) + obs))
    rs = replay_init(256, 10, obs, 3)
    report = fused_status(networks, config, params, rs)
    assert not report["fused_sampler"]["active"]
    # The conv family fails the LearnerSpec extraction before the ring
    # checks; either reason is a correct, named explanation.
    reason = report["fused_sampler"]["reason"]
    assert "LearnerSpec" in reason or "obs features" in reason

  def test_gate_rejects_misaligned_group_batch(self, monkeypatch):
    # group*batch = 8 * 24 = 192: divides no 128 lane tile; the r4 gate
    # accepted any W <= 512 (ADVICE r4) — it must fall back now.
    import muax_tpu.train.learner as learner_mod
    monkeypatch.setattr(learner_mod, "_ALLOW_FUSED_SAMPLER_ON_CPU", True)
    networks, config, params, rs = _mlp_setup(batch_size=24, presample=8)
    from muax_tpu.train.learner import make_multi_update_fn
    import optax
    mu = make_multi_update_fn(networks, optax.sgd(0.0), config)
    from muax_tpu.train.learner import TrainState
    ts = TrainState(params=params, opt_state=(), step=0)
    mode, lw, reason = mu.fused_group_status(ts, rs)
    assert mode is None and lw is None
    assert "128" in reason

  def test_gate_rejects_vmem_blowout(self, monkeypatch):
    # capacity 8192 passes the size cap, but a wide ring (64 obs features x
    # 32 actions x L=20) blows the const-resident VMEM estimate — the r4
    # gate would have compiled it into a Pallas VMEM failure (ADVICE r4).
    import optax
    import muax_tpu.train.learner as learner_mod
    monkeypatch.setattr(learner_mod, "_ALLOW_FUSED_SAMPLER_ON_CPU", True)
    config = MuZeroConfig(
        search=SearchConfig(policy="muzero", num_simulations=8),
        replay=ReplayConfig(capacity=8192, min_fill=8),
        train=TrainConfig(num_envs=8, collect_steps=20, batch_size=128,
                          updates_per_iteration=8, unroll_steps=5,
                          presample_updates=8))
    networks = make_mlp_networks(num_actions=32, embedding_dim=8,
                                 support_size=10)
    params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 64)))
    rs = replay_init(8192, 20, (64,), 32)
    from muax_tpu.train.learner import TrainState, make_multi_update_fn
    mu = make_multi_update_fn(networks, optax.sgd(0.0), config)
    ts = TrainState(params=params, opt_state=(), step=0)
    mode, lw, reason = mu.fused_group_status(ts, rs)
    assert mode is None and lw is None
    assert "VMEM" in reason

  def test_format_one_line(self):
    networks, config, params, rs = _mlp_setup()
    line = format_fused_status(fused_status(networks, config, params, rs))
    assert line.startswith("fused: ")
    assert "search=" in line and "sampler=" in line and "learner=" in line

  def test_fit_logs_report(self):
    from muax_tpu.envs import CartPole
    from muax_tpu.models import muzero_optimizer
    from muax_tpu.train.fit import fit
    config = MuZeroConfig(
        search=SearchConfig(policy="muzero", num_simulations=4),
        replay=ReplayConfig(capacity=64, min_fill=4),
        train=TrainConfig(num_envs=4, collect_steps=8, batch_size=16,
                          updates_per_iteration=1, unroll_steps=3,
                          n_bootstrap=3))
    networks = make_mlp_networks(num_actions=2, embedding_dim=4,
                                 support_size=5)
    lines = []
    fit(CartPole(), networks, config, muzero_optimizer(),
        num_iterations=1, seed=0, eval_every=100, log_every=100,
        model_dir="/tmp/fused_status_fit", log_fn=lines.append)
    assert any("fused:" in str(l) for l in lines)
