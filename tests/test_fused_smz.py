"""Fused stochastic-MuZero kernel vs the generic XLA engine (interpret
mode): decision/chance interleave, chance-edge rewards/discount, prior
tracking at chance nodes, and the policy wrapper."""
import jax
import jax.numpy as jnp
import numpy as np

from muax_tpu.models import make_stochastic_mlp_networks
from muax_tpu.search import stochastic_muzero_policy
from muax_tpu.search.fused import (extract_smz_fused_weights,
                                   fused_smz_policy, fused_smz_search)
from muax_tpu.train.inference import make_smz_fns


def _setup(num_actions=3, num_chance=4, obs_dim=5, support=10, batch=4):
  networks = make_stochastic_mlp_networks(
      num_actions, num_chance_outcomes=num_chance, embedding_dim=8,
      support_size=support, hidden=(16,))
  params = networks.init_params(jax.random.PRNGKey(0),
                                jnp.zeros((1, obs_dim)))
  obs = jax.random.normal(jax.random.PRNGKey(1), (batch, obs_dim))
  root_fn, decision_fn, chance_fn = make_smz_fns(networks, 0.95)
  root = root_fn(params, obs)
  return networks, params, root, decision_fn, chance_fn


def test_extract_parses_smz_structure():
  networks, params, *_ = _setup()
  w = extract_smz_fused_weights(networks, params)
  assert w is not None
  assert w.dec_state[0].shape[1] == 8          # afterstate head -> E
  assert w.dec_chance[0].shape[1] == 4
  assert w.pred_policy[0].shape[1] == 3
  bad = params._replace(chance={"conv": {"w": jnp.zeros((3, 3))}})
  assert extract_smz_fused_weights(networks, bad) is None


def test_fused_matches_xla_stochastic_search():
  networks, params, root, decision_fn, chance_fn = _setup()
  num_simulations = 24
  discount = 0.95

  out = stochastic_muzero_policy(
      params, jax.random.PRNGKey(2), root,
      decision_recurrent_fn=decision_fn, chance_recurrent_fn=chance_fn,
      num_simulations=num_simulations,
      num_chance_outcomes=networks.num_chance_outcomes,
      dirichlet_fraction=0.0, temperature=1.0, discount=discount)
  ref = out.search_tree.summary()
  ref_dec_visits = np.asarray(ref.visit_counts)[:, :3]

  weights = extract_smz_fused_weights(networks, params)
  visits, value, qvals = fused_smz_search(
      root.embedding, root.prior_logits, root.value, weights,
      num_simulations=num_simulations,
      num_chance_outcomes=networks.num_chance_outcomes,
      support_size=networks.support_size, discount=discount)

  # Every simulation passes through exactly one root (decision) edge.
  np.testing.assert_allclose(np.sum(visits, -1),
                             num_simulations * np.ones(visits.shape[0]))
  # Tie-breaking differs (deterministic vs the XLA engine's 1e-7 noise):
  # allow a couple of swapped visits, but the search shape must agree.
  assert np.abs(visits - ref_dec_visits).max() <= 2
  np.testing.assert_allclose(value, np.asarray(ref.value), rtol=1e-3,
                             atol=1e-3)
  assert visits.shape == (4, 3) and qvals.shape == (4, 3)


def test_chance_children_track_prior():
  """After many simulations through one root action, that afterstate's
  chance children are visited roughly in proportion to the chance prior —
  the defining behavior of the chance-node selection rule."""
  networks, params, root, *_ = _setup(num_actions=2, num_chance=3)
  weights = extract_smz_fused_weights(networks, params)
  # Single legal action -> all simulations descend through one afterstate.
  invalid = jnp.zeros((4, 2)).at[:, 1].set(1.0)
  visits, _, _ = fused_smz_search(
      root.embedding, jnp.where(invalid > 0, -1e9, root.prior_logits),
      root.value, weights, num_simulations=30,
      num_chance_outcomes=3, support_size=networks.support_size,
      discount=0.95, invalid_actions=invalid)
  assert np.all(np.asarray(visits[:, 1]) == 0.0)
  np.testing.assert_allclose(np.sum(visits, -1), 30.0)


def test_fused_smz_policy_output():
  networks, params, root, *_ = _setup()
  weights = extract_smz_fused_weights(networks, params)
  action, action_weights, value = fused_smz_policy(
      params, jax.random.PRNGKey(3), root, weights,
      num_simulations=16, num_chance_outcomes=4,
      support_size=networks.support_size, discount=0.95, temperature=1.0)
  assert action.shape == (4,) and action.dtype == jnp.int32
  np.testing.assert_allclose(np.sum(action_weights, -1), 1.0, rtol=1e-5)
  assert np.all(np.asarray(action) >= 0) and np.all(np.asarray(action) < 3)
  assert np.isfinite(np.asarray(value)).all()


def test_policy_weights_match_xla():
  """action_weights (normalized decision visit probs) match the XLA policy
  up to tie-break visit swaps."""
  networks, params, root, decision_fn, chance_fn = _setup()
  sims = 32
  out = stochastic_muzero_policy(
      params, jax.random.PRNGKey(2), root,
      decision_recurrent_fn=decision_fn, chance_recurrent_fn=chance_fn,
      num_simulations=sims, num_chance_outcomes=4,
      dirichlet_fraction=0.0, temperature=1.0, discount=0.95)
  weights = extract_smz_fused_weights(networks, params)
  _, aw, _ = fused_smz_policy(
      params, jax.random.PRNGKey(2), root, weights,
      num_simulations=sims, num_chance_outcomes=4,
      support_size=networks.support_size, discount=0.95,
      dirichlet_fraction=0.0, temperature=1.0)
  np.testing.assert_allclose(np.asarray(aw),
                             np.asarray(out.action_weights),
                             atol=2.5 / sims)


def test_max_depth_caps_the_walk_and_matches_xla():
  """max_depth bounds the descent while-loop — the production knob for the
  depth-dependent search cost a converged net induces (r5 root cause:
  scripts/smz_degradation_series.json). Capped fused search must still
  agree with the capped XLA engine."""
  networks, params, root, decision_fn, chance_fn = _setup()
  num_simulations = 24
  discount = 0.95

  out = stochastic_muzero_policy(
      params, jax.random.PRNGKey(2), root,
      decision_recurrent_fn=decision_fn, chance_recurrent_fn=chance_fn,
      num_simulations=num_simulations,
      num_chance_outcomes=networks.num_chance_outcomes,
      dirichlet_fraction=0.0, temperature=1.0, discount=discount,
      max_depth=2)
  ref = out.search_tree.summary()
  ref_dec_visits = np.asarray(ref.visit_counts)[:, :3]

  weights = extract_smz_fused_weights(networks, params)
  visits, value, qvals = fused_smz_search(
      root.embedding, root.prior_logits, root.value, weights,
      num_simulations=num_simulations,
      num_chance_outcomes=networks.num_chance_outcomes,
      support_size=networks.support_size, discount=discount,
      max_depth=2)

  np.testing.assert_allclose(np.sum(visits, -1),
                             num_simulations * np.ones(visits.shape[0]))
  assert np.abs(visits - ref_dec_visits).max() <= 2
  np.testing.assert_allclose(value, np.asarray(ref.value), rtol=1e-3,
                             atol=1e-3)
