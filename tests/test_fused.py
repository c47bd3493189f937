"""Fused Pallas search kernel vs the generic XLA engine (interpret mode).

The kernel must reproduce ``policies.muzero_policy`` semantics (PUCT with
qtransform_by_parent_and_siblings, running-mean backups, depth-cap
re-evaluation). On CPU the kernel runs in Pallas interpret mode; the real-TPU
compiled path is exercised by bench.py and the driver's entry check.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muax_tpu.models import make_mlp_networks
from muax_tpu.search import muzero_policy
from muax_tpu.search.fused import (
    extract_fused_weights,
    fused_mlp_muzero_policy,
    fused_muzero_search,
)
from muax_tpu.train.inference import make_recurrent_fn, make_root_fn


def _setup(num_actions=3, obs_dim=5, support=10, batch=4, **net_kwargs):
  networks = make_mlp_networks(num_actions=num_actions, embedding_dim=8,
                               support_size=support, **net_kwargs)
  params = networks.init_params(jax.random.PRNGKey(0),
                                jnp.zeros((1, obs_dim)))
  obs = jax.random.normal(jax.random.PRNGKey(1), (batch, obs_dim))
  root = make_root_fn(networks)(params, obs)
  return networks, params, root


@pytest.mark.parametrize("net_kwargs", [{}, {"pred_layers": (16, 16),
                                             "dyn_layers": (16, 16)}])
def test_fused_matches_xla_search(net_kwargs):
  networks, params, root = _setup(**net_kwargs)
  num_simulations = 24
  discount = 0.97

  # XLA reference: muzero_policy without root noise (tie-break noise only).
  out = muzero_policy(params, jax.random.PRNGKey(2), root,
                      make_recurrent_fn(networks, discount),
                      num_simulations=num_simulations,
                      dirichlet_fraction=0.0, temperature=1.0)
  ref_summary = out.search_tree.summary()

  weights = extract_fused_weights(networks, params)
  assert weights is not None
  visits, value, qvalues = fused_muzero_search(
      root.embedding, root.prior_logits, root.value, weights,
      num_simulations=num_simulations,
      support_size=networks.support_size, discount=discount)

  np.testing.assert_allclose(np.sum(visits, -1),
                             num_simulations * np.ones(visits.shape[0]))
  # Tie-breaking differs (deterministic vs randomized 1e-7 noise): allow a
  # couple of swapped visits, but the shape of the search must agree.
  assert np.abs(visits - np.asarray(ref_summary.visit_counts)).max() <= 2
  np.testing.assert_allclose(value, np.asarray(ref_summary.value),
                             rtol=1e-3, atol=1e-3)
  assert visits.shape == (4, 3) and qvalues.shape == (4, 3)


def test_fused_policy_output():
  networks, params, root = _setup()
  weights = extract_fused_weights(networks, params)
  action, action_weights, value = fused_mlp_muzero_policy(
      params, jax.random.PRNGKey(3), root, weights,
      num_simulations=16, support_size=networks.support_size,
      discount=0.99, temperature=1.0)
  assert action.shape == (4,) and action.dtype == jnp.int32
  np.testing.assert_allclose(np.sum(action_weights, -1), 1.0, rtol=1e-5)
  assert np.all(np.asarray(action) >= 0) and np.all(np.asarray(action) < 3)
  assert np.isfinite(np.asarray(value)).all()


def test_fused_depth_cap_and_invalid_actions():
  networks, params, root = _setup(num_actions=4)
  weights = extract_fused_weights(networks, params)
  invalid = jnp.zeros((4, 4)).at[:, 2].set(1.0)
  visits, value, _ = fused_muzero_search(
      root.embedding,
      jnp.where(invalid > 0, -1e9, root.prior_logits),
      root.value, weights,
      num_simulations=12, support_size=networks.support_size,
      discount=0.99, invalid_actions=invalid, max_depth=2)
  np.testing.assert_allclose(np.sum(visits, -1), 12.0)
  assert np.all(np.asarray(visits[:, 2]) == 0.0)


def test_extract_rejects_foreign_structure():
  networks, params, _ = _setup()
  bad = params._replace(dynamic={"conv": {"w": jnp.zeros((3, 3))}})
  assert extract_fused_weights(networks, bad) is None


class TestFusedCategorical:
  """The kernel on the acme two-hot family (LayerNormMLP towers + linear
  [vmin, vmax] bins) vs the XLA engine."""

  def _setup(self, batch=6):
    from muax_tpu.models import make_categorical_mlp_networks
    networks = make_categorical_mlp_networks(
        num_actions=3, embedding_dim=16, num_bins=21, vmin=-10.0,
        vmax=10.0, layer_sizes=(32, 32))
    params = networks.init_params(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 5)))
    obs = jax.random.normal(jax.random.PRNGKey(1), (batch, 5))
    root = make_root_fn(networks)(params, obs)
    return networks, params, root

  def test_extract_parses_layernorm_towers(self):
    from muax_tpu.search.fused import extract_categorical_fused_weights
    networks, params, _ = self._setup()
    spec = extract_categorical_fused_weights(networks, params)
    assert spec is not None
    assert spec.decode == "linear" and spec.num_bins == 21
    kinds_d = tuple(k for k, _ in spec.dyn_layers)
    assert kinds_d == ("ln_tanh", "elu")
    assert spec.dyn_state[0].shape[1] == 16
    assert spec.pred_value[0].shape[1] == 21
    assert spec.pred_policy[0].shape[1] == 3

  def test_matches_xla_search(self):
    from muax_tpu.search.fused import (_fused_search,
                                       extract_categorical_fused_weights)
    networks, params, root = self._setup()
    num_simulations = 20
    out = muzero_policy(params, jax.random.PRNGKey(2), root,
                        make_recurrent_fn(networks, 0.99),
                        num_simulations=num_simulations,
                        dirichlet_fraction=0.0, temperature=1.0)
    ref = out.search_tree.summary()
    spec = extract_categorical_fused_weights(networks, params)
    visits, value, _ = _fused_search(
        root.embedding, root.prior_logits, root.value, spec,
        policy="muzero", num_simulations=num_simulations, discount=0.99)
    np.testing.assert_allclose(np.sum(visits, -1), float(num_simulations))
    assert np.abs(visits - np.asarray(ref.visit_counts)).max() <= 2
    np.testing.assert_allclose(value, np.asarray(ref.value),
                               rtol=1e-3, atol=1e-3)


class TestFusedGumbel:
  """The gumbel kernel vs policies.gumbel_muzero_policy (interpret mode)."""

  def test_matches_xla_gumbel_search(self):
    from muax_tpu.search import gumbel_muzero_policy
    from muax_tpu.search.fused import fused_gumbel_search
    networks, params, root = _setup(num_actions=4, batch=8)
    num_simulations = 24
    discount = 0.97
    max_considered = 4

    rng = jax.random.PRNGKey(2)
    out = gumbel_muzero_policy(
        params, rng, root, make_recurrent_fn(networks, discount),
        num_simulations=num_simulations,
        max_num_considered_actions=max_considered, gumbel_scale=1.0)
    ref_summary = out.search_tree.summary()

    # Same gumbel draw as the XLA policy (same rng split layout).
    _, gumbel_rng, _ = jax.random.split(rng, 3)
    gumbel = jax.random.gumbel(gumbel_rng, root.prior_logits.shape,
                               root.prior_logits.dtype)
    weights = extract_fused_weights(networks, params)
    visits, value, completed_q = fused_gumbel_search(
        root.embedding, root.prior_logits, root.value, weights,
        gumbel=gumbel, max_num_considered_actions=max_considered,
        num_simulations=num_simulations,
        support_size=networks.support_size, discount=discount)

    np.testing.assert_allclose(np.sum(visits, -1),
                               num_simulations * np.ones(visits.shape[0]))
    # Sequential halving is deterministic given the gumbel draw: visit
    # counts must match the XLA engine exactly.
    np.testing.assert_array_equal(visits,
                                  np.asarray(ref_summary.visit_counts))
    np.testing.assert_allclose(value, np.asarray(ref_summary.value),
                               rtol=1e-3, atol=1e-3)

  def test_policy_output_matches_xla(self):
    from muax_tpu.search import gumbel_muzero_policy
    from muax_tpu.search.fused import fused_mlp_gumbel_policy
    networks, params, root = _setup(num_actions=4, batch=8)
    rng = jax.random.PRNGKey(5)
    ref = gumbel_muzero_policy(
        params, rng, root, make_recurrent_fn(networks, 0.99),
        num_simulations=16, max_num_considered_actions=4)
    weights = extract_fused_weights(networks, params)
    action, action_weights, value = fused_mlp_gumbel_policy(
        params, rng, root, weights,
        num_simulations=16, support_size=networks.support_size,
        discount=0.99, max_num_considered_actions=4)
    np.testing.assert_array_equal(np.asarray(action), np.asarray(ref.action))
    np.testing.assert_allclose(np.asarray(action_weights),
                               np.asarray(ref.action_weights),
                               rtol=1e-4, atol=1e-5)

  def test_invalid_actions_never_visited(self):
    from muax_tpu.search.fused import fused_gumbel_search
    networks, params, root = _setup(num_actions=4, batch=4)
    weights = extract_fused_weights(networks, params)
    invalid = jnp.zeros((4, 4)).at[:, 1].set(1.0)
    gumbel = jax.random.gumbel(jax.random.PRNGKey(0), (4, 4))
    visits, _, _ = fused_gumbel_search(
        root.embedding, jnp.where(invalid > 0, -1e9, root.prior_logits),
        root.value, weights, gumbel=gumbel, max_num_considered_actions=4,
        num_simulations=12, support_size=networks.support_size,
        discount=0.99, invalid_actions=invalid)
    np.testing.assert_allclose(np.sum(visits, -1), 12.0)
    assert np.all(np.asarray(visits[:, 1]) == 0.0)
