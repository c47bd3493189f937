"""Diffusion model library + diffusion MuZero policy."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from muax_tpu import search as mx
from muax_tpu.models.diffusion import (RectifiedFlow, flow_matching_loss)
from muax_tpu.search.diffusion_policy import diffusion_muzero_policy


class TestRectifiedFlow:

  def test_marginal_prob(self):
    flow = RectifiedFlow(sigma=2.0)
    x0 = jnp.ones((4, 3))
    mean, std = flow.marginal_prob(x0, jnp.full((4,), 0.5))
    np.testing.assert_allclose(np.asarray(mean), 0.5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(std), 1.0, rtol=1e-5)

  def test_prior_logp_is_gaussian(self):
    flow = RectifiedFlow(sigma=1.0)
    z = jnp.zeros((2, 4))
    lp = flow.prior_logp(z)
    expected = -0.5 * 4 * np.log(2 * np.pi)
    np.testing.assert_allclose(np.asarray(lp), expected, rtol=1e-5)

  def test_flow_matching_learns_point_mass(self):
    """Train a velocity net to transport N(0,1) to a point mass at mu; the
    Euler ODE sampler must land near mu."""
    flow = RectifiedFlow(sigma=1.0, num_steps=30)
    mu = jnp.asarray([2.0, -1.0])

    import haiku as hk

    def vel(x, t, cond):
      del cond
      h = jnp.concatenate([x, t[..., None]], -1)
      h = jax.nn.relu(hk.Linear(64)(h))
      return hk.Linear(2)(h)

    net = hk.without_apply_rng(hk.transform(vel))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 2)),
                      jnp.zeros((1,)), None)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    x0 = jnp.tile(mu, (256, 1))

    @jax.jit
    def step(params, opt_state, rng):
      loss, grads = jax.value_and_grad(
          lambda p: flow_matching_loss(
              lambda x, t, c: net.apply(p, x, t, c), rng, x0,
              flow=flow))(params)
      updates, opt_state = opt.update(grads, opt_state)
      return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(1)
    for i in range(300):
      rng, r = jax.random.split(rng)
      params, opt_state, loss = step(params, opt_state, r)

    samples = flow.euler_ode(
        lambda x, t, c: net.apply(params, x, t, c),
        jax.random.PRNGKey(2), (128, 2))
    err = np.abs(np.asarray(jnp.mean(samples, 0)) - np.asarray(mu))
    assert np.all(err < 0.3), err


class TestDiffusionPolicy:

  def test_finds_best_action(self):
    """Afterstate = action value; candidates = afterstate + small noise;
    reward = committed state's first coordinate. Best action = 2."""
    num_actions, num_samples = 3, 4

    def decision_fn(params, rng, action, state):
      del params, rng
      batch = action.shape[0]
      out = mx.DecisionRecurrentFnOutput(
          chance_logits=jnp.zeros((batch, num_samples)),
          afterstate_value=jnp.zeros((batch,)))
      return out, state + action[:, None].astype(jnp.float32)

    def sample_fn(params, rng, afterstate):
      del params
      noise = 0.01 * jax.random.normal(
          rng, (afterstate.shape[0], num_samples) + afterstate.shape[1:])
      return afterstate[:, None] + noise

    def chance_eval_fn(params, rng, next_state):
      del params, rng
      batch = next_state.shape[0]
      return mx.ChanceRecurrentFnOutput(
          action_logits=jnp.zeros((batch, num_actions)),
          value=jnp.zeros((batch,)),
          reward=next_state[:, 0])

    root = mx.RootFnOutput(prior_logits=jnp.zeros((2, num_actions)),
                           value=jnp.zeros((2,)),
                           embedding=jnp.zeros((2, 2)))
    out = jax.jit(functools.partial(
        diffusion_muzero_policy,
        decision_recurrent_fn=decision_fn, sample_fn=sample_fn,
        chance_eval_fn=chance_eval_fn, num_simulations=96,
        num_samples=num_samples, dirichlet_fraction=0.0,
        temperature=0.0, discount=0.5))((), jax.random.PRNGKey(0), root)
    np.testing.assert_array_equal(np.asarray(out.action), 2)
    assert out.action_weights.shape == (2, num_actions)
    np.testing.assert_allclose(np.asarray(out.action_weights).sum(-1), 1.0,
                               rtol=1e-5)

  def test_alternating_levels(self):
    num_actions, num_samples = 2, 3

    def decision_fn(params, rng, action, state):
      batch = action.shape[0]
      return mx.DecisionRecurrentFnOutput(
          chance_logits=jnp.zeros((batch, num_samples)),
          afterstate_value=jnp.zeros((batch,))), state

    def sample_fn(params, rng, afterstate):
      return jnp.tile(afterstate[:, None], (1, num_samples, 1))

    def chance_eval_fn(params, rng, next_state):
      batch = next_state.shape[0]
      return mx.ChanceRecurrentFnOutput(
          action_logits=jnp.zeros((batch, num_actions)),
          value=jnp.zeros((batch,)), reward=jnp.zeros((batch,)))

    root = mx.RootFnOutput(prior_logits=jnp.zeros((1, num_actions)),
                           value=jnp.zeros((1,)),
                           embedding=jnp.zeros((1, 2)))
    out = diffusion_muzero_policy(
        (), jax.random.PRNGKey(0), root,
        decision_recurrent_fn=decision_fn, sample_fn=sample_fn,
        chance_eval_fn=chance_eval_fn, num_simulations=12,
        num_samples=num_samples)
    tree = out.search_tree
    is_dec = np.asarray(tree.embeddings.is_decision_node[0])
    visits = np.asarray(tree.node_visits[0])
    parents = np.asarray(tree.parents[0])
    for node in range(1, 13):
      if visits[node] == 0:
        continue
      assert is_dec[node] != is_dec[parents[node]]
