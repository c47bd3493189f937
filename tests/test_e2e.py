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
    """Shallow Catch (3 rows — the reference's own behavioral scale,
    acme/tf/mcts/search_test.py uses rows=2): random play averages ~ -0.6,
    a learning agent must clearly beat it within a few hundred updates."""
    config = MuZeroConfig(
        search=SearchConfig(num_simulations=16, dirichlet_alpha=1.0),
        replay=ReplayConfig(capacity=512, min_fill=32),
        train=TrainConfig(num_envs=32, collect_steps=8, batch_size=64,
                          updates_per_iteration=4, unroll_steps=3,
                          n_bootstrap=5, discount=0.99,
                          temperature_schedule=((0.5, 1.0), (1.0, 0.5))))
    networks = make_mlp_networks(3, embedding_dim=32, support_size=5,
                                 repr_layers=(64,), pred_layers=(64,),
                                 dyn_layers=(64,))
    optimizer = create_optimizer("adam", lr=2e-3)
    state, results = fit(Catch(rows=3, columns=5), networks, config,
                         optimizer, num_iterations=60, eval_every=10,
                         log_every=10, save_best=False,
                         log_fn=lambda s: None, target_reward=0.8)
    assert results["best_reward"] >= -1.0  # evaluated at all
    test_gs = [row["test_G"] for row in results["history"]
               if "test_G" in row]
    assert max(test_gs) > 0.3, f"no learning progress: {test_gs}"
