"""End-to-end training smoke + learning tests (SURVEY §4 level 3/5).

Catch is the fast learning benchmark (the reference's own behavioral env,
acme/tf/mcts/search_test.py); the full CartPole-to-500 parity run lives in
bench.py, not here.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muax_tpu.config import MuZeroConfig, ReplayConfig, SearchConfig, TrainConfig
from muax_tpu.envs import CartPole, Catch
from muax_tpu.models import make_mlp_networks, create_optimizer
from muax_tpu.train.fit import fit


class TestFit:

  def test_cartpole_smoke(self, tmp_path):
    config = MuZeroConfig(
        search=SearchConfig(num_simulations=4),
        replay=ReplayConfig(capacity=128, min_fill=8),
        train=TrainConfig(num_envs=8, collect_steps=10, batch_size=16,
                          updates_per_iteration=2, unroll_steps=3,
                          n_bootstrap=5))
    networks = make_mlp_networks(2, embedding_dim=8, support_size=10)
    state, results = fit(CartPole(), networks, config, num_iterations=4,
                         eval_every=2, log_every=2,
                         model_dir=str(tmp_path), log_fn=lambda s: None)
    assert len(results["history"]) >= 1
    assert results["model_path"] is not None
    assert np.isfinite(results["best_reward"])
    # All logged metrics finite.
    for row in results["history"]:
      for k, v in row.items():
        assert np.isfinite(v), (k, v)

  def test_catch_learns(self):
    """2-row Catch (the reference's own behavioral scale,
    acme/tf/mcts/search_test.py uses rows=2): the catch reward is one step
    away, so the search sees it directly; random play averages ~ -1/3 and a
    learning agent must clearly beat it within a couple hundred updates."""
    config = MuZeroConfig(
        search=SearchConfig(num_simulations=8, dirichlet_alpha=1.0),
        replay=ReplayConfig(capacity=256, min_fill=16),
        train=TrainConfig(num_envs=32, collect_steps=6, batch_size=64,
                          updates_per_iteration=16, unroll_steps=2,
                          n_bootstrap=3, discount=0.99,
                          temperature_schedule=((0.5, 1.0), (1.0, 0.5))))
    networks = make_mlp_networks(3, embedding_dim=16, support_size=3,
                                 repr_layers=(32,), pred_layers=(32,),
                                 dyn_layers=(32,))
    optimizer = create_optimizer("adam", lr=3e-3)
    state, results = fit(Catch(rows=2, columns=3), networks, config,
                         optimizer, num_iterations=50, eval_every=10,
                         log_every=10, save_best=False,
                         log_fn=lambda s: None, target_reward=0.9)
    assert results["best_reward"] >= -1.0  # evaluated at all
    test_gs = [row["test_G"] for row in results["history"]
               if "test_G" in row]
    assert max(test_gs) > 0.3, f"no learning progress: {test_gs}"

  def test_stochastic_fit_smoke(self, tmp_path):
    """Stochastic MuZero end-to-end through the vectorized driver."""
    from muax_tpu.models import make_stochastic_mlp_networks
    config = MuZeroConfig(
        search=SearchConfig(policy="stochastic", num_simulations=6,
                            num_chance_outcomes=4),
        replay=ReplayConfig(capacity=64, min_fill=8),
        train=TrainConfig(num_envs=8, collect_steps=8, batch_size=8,
                          updates_per_iteration=2, unroll_steps=3,
                          n_bootstrap=5))
    networks = make_stochastic_mlp_networks(
        num_actions=2, num_chance_outcomes=4, embedding_dim=16,
        support_size=10, hidden=(32,))
    state, results = fit(CartPole(), networks, config,
                         create_optimizer("adam", 1e-3),
                         num_iterations=3, eval_every=2, log_every=2,
                         model_dir=str(tmp_path), log_fn=lambda s: None)
    for row in results["history"]:
      for k, v in row.items():
        assert np.isfinite(v), (k, v)
