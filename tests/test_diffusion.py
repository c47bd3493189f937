"""Diffusion model library + diffusion MuZero policy + learner."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from muax_tpu import search as mx
from muax_tpu.agents import DiffusionMuZero
from muax_tpu.models.diffusion import (RectifiedFlow, flow_matching_loss)
from muax_tpu.models.diffusion_losses import diffusion_muzero_loss
from muax_tpu.models.diffusion_networks import make_diffusion_mlp_networks
from muax_tpu.search.diffusion_policy import diffusion_muzero_policy
from muax_tpu.types import Transition


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


def _toy_batch(rng, networks, B=16, L=6, obs_dim=4):
  """Synthetic [B, L] window from a deterministic toy MDP: obs rotates by
  the action, reward = obs[0]. Gives the flow a learnable transition."""
  ks = jax.random.split(rng, 3)
  obs0 = jax.random.normal(ks[0], (B, obs_dim))
  actions = jax.random.randint(ks[1], (B, L), 0, networks.num_actions)

  def step(obs, a):
    shift = a.astype(obs.dtype)[:, None]
    nxt = jnp.roll(obs, 1, axis=-1) + 0.1 * shift
    return nxt, obs

  def scan_step(obs, a):
    nxt, o = step(obs, a)
    return nxt, o

  _, obs_seq = jax.lax.scan(scan_step, obs0, actions.T)
  obs_seq = jnp.swapaxes(obs_seq, 0, 1)                       # [B, L, D]
  reward = obs_seq[..., 0]
  pi = jax.nn.softmax(jax.random.normal(ks[2],
                                        (B, L, networks.num_actions)), -1)
  return Transition(
      obs=obs_seq, action=actions, reward=reward,
      done=jnp.zeros((B, L), bool), rn=reward, value=reward, pi=pi,
      weight=jnp.ones((B,)), mask=jnp.ones((B, L)))


class TestDiffusionLearner:

  def test_loss_finite_and_metrics(self):
    networks = make_diffusion_mlp_networks(num_actions=3, embedding_dim=8,
                                           support_size=10)
    params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    batch = _toy_batch(jax.random.PRNGKey(1), networks)
    total, metrics = diffusion_muzero_loss(params, batch, networks,
                                           jax.random.PRNGKey(2))
    assert np.isfinite(float(total))
    assert metrics.priorities.shape == (batch.action.shape[0],)
    for name in ("reward_loss", "value_loss", "policy_loss",
                 "afterstate_value_loss", "flow_loss"):
      assert np.isfinite(float(getattr(metrics, name))), name

  def test_mask_zeroes_post_terminal_steps(self):
    """Steps after the first invalid step must not contribute gradients."""
    networks = make_diffusion_mlp_networks(num_actions=3, embedding_dim=8,
                                           support_size=10)
    params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    batch = _toy_batch(jax.random.PRNGKey(1), networks)
    # Corrupt the masked-out tail: loss must be invariant to it.
    mask = batch.mask.at[:, 3:].set(0.0)
    b1 = batch.replace(mask=mask)
    b2 = batch.replace(
        mask=mask,
        obs=batch.obs.at[:, 4:].set(1e6),
        reward=batch.reward.at[:, 4:].set(1e6),
        rn=batch.rn.at[:, 4:].set(1e6))
    t1, _ = diffusion_muzero_loss(params, b1, networks, jax.random.PRNGKey(2))
    t2, _ = diffusion_muzero_loss(params, b2, networks, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-5)

  def test_training_reduces_loss_and_flow_learns_dynamics(self):
    """SGD on the unrolled loss must reduce it, and afterwards the flow's
    conditional-mean readout must approximate the true next latent better
    than an untrained one (the learner delta the reference never wired:
    acme/jax/diffusion_muzero/learning.py:229)."""
    networks = make_diffusion_mlp_networks(num_actions=3, embedding_dim=8,
                                           support_size=10, hidden=(32,))
    agent = DiffusionMuZero(networks, optimizer=optax.adam(3e-3),
                            unroll_steps=4)
    agent.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    params0 = agent.params
    rng = jax.random.PRNGKey(1)
    batch = _toy_batch(rng, networks, B=32)

    losses = []
    for i in range(150):
      rng, r = jax.random.split(rng)
      losses.append(float(agent.update(batch, rng)))
    assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:10]), (
        losses[:10], losses[-10:])

    def flow_error(params):
      s = networks.representation.apply(params.representation,
                                        batch.obs[:, 0])
      z_next = networks.representation.apply(params.representation,
                                             batch.obs[:, 1])
      afterstate, _ = networks.decision.apply(params.decision, s,
                                              batch.action[:, 0])
      pred = networks.mean_next_state(params, afterstate)
      return float(jnp.mean(jnp.square(pred - z_next)))

    assert flow_error(agent.params) < flow_error(params0)

  def test_agent_act_update_save_load(self, tmp_path):
    networks = make_diffusion_mlp_networks(num_actions=3, embedding_dim=8,
                                           support_size=10, num_samples=3)
    agent = DiffusionMuZero(networks)
    agent.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    obs = np.random.RandomState(0).randn(4).astype(np.float32)
    a, pi, v = agent.act(jax.random.PRNGKey(1), obs, with_pi=True,
                         with_value=True, num_simulations=8)
    assert 0 <= int(a) < 3
    assert pi.shape == (3,)
    np.testing.assert_allclose(float(jnp.sum(pi)), 1.0, rtol=1e-5)
    batch = _toy_batch(jax.random.PRNGKey(2), networks, B=8, L=4)
    agent.update(batch)

    path = str(tmp_path / "dmz.ckpt")
    agent.save(path)
    restored = DiffusionMuZero(networks).load(path)
    for a_leaf, b_leaf in zip(jax.tree.leaves(agent.params),
                              jax.tree.leaves(restored.params)):
      np.testing.assert_array_equal(np.asarray(a_leaf), np.asarray(b_leaf))
