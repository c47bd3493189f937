"""Sampled MuZero: continuous/factored action search (SURVEY §2f
SampledMCTS parity)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from muax_tpu.search import (
    ContinuousRecurrentFnOutput,
    RootFnOutput,
    make_factored_bin_sample_fn,
    make_gaussian_sample_fn,
    sampled_muzero_policy,
)


class TestSampledPolicy:

  def test_continuous_bandit_finds_best_action(self):
    """reward = -(a - 0.7)^2 with discount 0: the policy must commit to the
    candidate closest to 0.7."""
    B, K = 4, 8
    grid = jnp.linspace(-1.0, 1.0, K)  # closest to 0.7: grid[6] ~ 0.714

    def sample_fn(params, rng, state):
      del params, rng
      batch = state.shape[0]
      return jnp.broadcast_to(grid[None, :, None], (batch, K, 1)), None

    def recurrent_fn(params, rng, action, state):
      del params, rng
      reward = -jnp.square(action[:, 0] - 0.7)
      out = ContinuousRecurrentFnOutput(
          reward=reward, discount=jnp.zeros_like(reward),
          value=jnp.zeros_like(reward))
      return out, state

    root = RootFnOutput(prior_logits=jnp.zeros((B, K)),
                        value=jnp.zeros((B,)),
                        embedding=jnp.zeros((B, 2)))
    out = jax.jit(functools.partial(
        sampled_muzero_policy, sample_fn=sample_fn,
        recurrent_fn=recurrent_fn, num_simulations=192, num_samples=K,
        dirichlet_fraction=0.0, temperature=0.0))(
            (), jax.random.PRNGKey(0), root)
    np.testing.assert_allclose(np.asarray(out.action[:, 0]),
                               float(grid[6]), rtol=1e-5)
    assert out.action_weights.shape == (B, K)
    assert out.sampled_actions.shape == (B, K, 1)

  def test_delayed_reward_needs_lookahead(self):
    """Two candidates: slot 1 pays 1 now; slot 0 pays nothing now but 10 one
    step later (0.9-discounted: 9 > 1). Only a deeper search can prefer
    slot 0."""
    B, K = 2, 2
    grid = jnp.asarray([0.0, 1.0])

    def sample_fn(params, rng, state):
      del params, rng
      return jnp.broadcast_to(grid[None, :, None],
                              (state.shape[0], K, 1)), None

    def recurrent_fn(params, rng, action, state):
      # state[:, 0]: 1.0 once the delayed branch (action 0.0) was entered.
      entered_delayed = state[:, 0]
      reward = jnp.where(entered_delayed > 0.5, 10.0,
                         jnp.where(action[:, 0] > 0.5, 1.0, 0.0))
      out = ContinuousRecurrentFnOutput(
          reward=reward,
          discount=jnp.where(entered_delayed > 0.5, 0.0, 0.9),
          value=jnp.zeros_like(reward))
      next_state = jnp.where(action[:, 0:1] < 0.5,
                             jnp.ones_like(state), jnp.zeros_like(state))
      return out, next_state

    root = RootFnOutput(prior_logits=jnp.zeros((B, K)),
                        value=jnp.zeros((B,)),
                        embedding=jnp.zeros((B, 1)))
    out = sampled_muzero_policy(
        (), jax.random.PRNGKey(0), root, sample_fn=sample_fn,
        recurrent_fn=recurrent_fn, num_simulations=64, num_samples=K,
        max_depth=2, dirichlet_fraction=0.0, temperature=0.0)
    np.testing.assert_allclose(np.asarray(out.action[:, 0]), 0.0, atol=1e-6)


class TestFactoredBins:

  def test_bin_centers_and_log_probs(self):
    D, BINS, K = 3, 4, 16
    low = jnp.asarray([-1.0, 0.0, 2.0])
    high = jnp.asarray([1.0, 4.0, 3.0])

    def dim_logits_fn(params, state):
      del params
      # Strongly favor bin 2 in every dimension.
      logits = jnp.full((state.shape[0], D, BINS), -10.0)
      return logits.at[:, :, 2].set(10.0)

    sample_fn = make_factored_bin_sample_fn(dim_logits_fn, low, high, BINS, K)
    actions, log_probs = sample_fn((), jax.random.PRNGKey(0),
                                   jnp.zeros((5, 7)))
    assert actions.shape == (5, K, D)
    assert log_probs.shape == (5, K)
    # Bin 2 center per dimension: low + 2.5 * (high - low) / 4
    expected = np.broadcast_to(np.asarray(low + 2.5 * (high - low) / BINS),
                               (5, K, D))
    np.testing.assert_allclose(np.asarray(actions), expected, rtol=1e-5)
    # log-prob of the dominant bins ~ 0 (prob ~ 1 per dimension).
    assert np.all(np.asarray(log_probs) > -1e-2)

  def test_in_range(self):
    sample_fn = make_factored_bin_sample_fn(
        lambda p, s: jnp.zeros((s.shape[0], 2, 8)),
        low=jnp.asarray([-2.0, 0.0]), high=jnp.asarray([2.0, 1.0]),
        num_bins=8, num_samples=32)
    actions, _ = sample_fn((), jax.random.PRNGKey(1), jnp.zeros((3, 4)))
    a = np.asarray(actions)
    assert a[..., 0].min() >= -2.0 and a[..., 0].max() <= 2.0
    assert a[..., 1].min() >= 0.0 and a[..., 1].max() <= 1.0


class TestGaussianSampleFn:

  def test_shapes_and_clipping(self):
    def gparams(params, state):
      del params
      mu = jnp.zeros((state.shape[0], 2))
      return mu, jnp.zeros_like(mu)  # std = 1

    sample_fn = make_gaussian_sample_fn(gparams, num_samples=64,
                                        low=-0.5, high=0.5)
    actions, log_probs = sample_fn((), jax.random.PRNGKey(0),
                                   jnp.zeros((4, 3)))
    assert actions.shape == (4, 64, 2)
    assert log_probs.shape == (4, 64)
    assert float(jnp.max(jnp.abs(actions))) <= 0.5

  def test_end_to_end_with_gaussian(self):
    """Gaussian proposal + quadratic reward: the search must commit to the
    best sampled candidate in every batch row. K is kept small because
    PUCT's pessimistic Q-completion explores cold arms at a rate set by the
    prior (1/K) — the same few-arms regime the reference's sampled actor
    uses (k_bins ~ 4-8 per dimension, acting.py:313-345)."""
    B, K = 8, 4

    def gparams(params, state):
      del params
      return jnp.zeros((state.shape[0], 1)), jnp.zeros((state.shape[0], 1))

    gaussian = make_gaussian_sample_fn(gparams, num_samples=K)

    def sample_fn(params, rng, state):
      # Uniform empirical prior (Sampled MuZero recipe): with iid proposal
      # draws the slot prior is 1/K, so the search explores every candidate
      # instead of trusting the (here deliberately wrong) proposal density.
      actions, _ = gaussian(params, rng, state)
      return actions, None

    def recurrent_fn(params, rng, action, state):
      reward = -jnp.square(action[:, 0] - 1.0)
      out = ContinuousRecurrentFnOutput(
          reward=reward, discount=jnp.zeros_like(reward),
          value=jnp.zeros_like(reward))
      return out, state

    root = RootFnOutput(prior_logits=jnp.zeros((B, K)),
                        value=jnp.zeros((B,)),
                        embedding=jnp.zeros((B, 1)))
    out = sampled_muzero_policy(
        (), jax.random.PRNGKey(3), root, sample_fn=sample_fn,
        recurrent_fn=recurrent_fn, num_simulations=64, num_samples=K,
        dirichlet_fraction=0.0, temperature=0.0)
    best_slot = jnp.argmin(jnp.abs(out.sampled_actions[..., 0] - 1.0),
                           axis=1)
    np.testing.assert_array_equal(np.asarray(out.action_slot),
                                  np.asarray(best_slot))
