"""Standalone agent API (reference muax/model.py parity surface)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muax_tpu.agents import MuZero, StochasticMuZero
from muax_tpu.models import create_optimizer, make_mlp_networks
from muax_tpu.models.stochastic_networks import make_stochastic_mlp_networks
from muax_tpu.models.stochastic_losses import stochastic_muzero_loss
from muax_tpu.types import Transition


def make_batch(rng, B=8, L=4, obs_shape=(4,), num_actions=2):
  ks = jax.random.split(rng, 4)
  return Transition(
      obs=jax.random.normal(ks[0], (B, L) + obs_shape),
      action=jax.random.randint(ks[1], (B, L), 0, num_actions),
      reward=jax.random.uniform(ks[2], (B, L)),
      done=jnp.zeros((B, L), bool),
      rn=jax.random.uniform(ks[3], (B, L)) * 2,
      value=jnp.zeros((B, L)),
      pi=jnp.ones((B, L, num_actions)) / num_actions,
      weight=jnp.ones((B,)),
      mask=jnp.ones((B, L)),
  )


class TestMuZeroAgent:

  def _agent(self):
    networks = make_mlp_networks(2, embedding_dim=8, support_size=10)
    agent = MuZero(networks, optimizer=create_optimizer("adam", 1e-3),
                   unroll_steps=4)
    agent.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    return agent

  def test_act_single_obs(self):
    agent = self._agent()
    a = agent.act(jax.random.PRNGKey(1), jnp.zeros(4), num_simulations=8)
    assert int(a) in (0, 1)

  def test_act_with_pi_and_value(self):
    agent = self._agent()
    a, pi, v = agent.act(jax.random.PRNGKey(1), jnp.zeros(4),
                         with_pi=True, with_value=True, num_simulations=8)
    assert pi.shape == (2,)
    np.testing.assert_allclose(float(jnp.sum(pi)), 1.0, rtol=1e-5)
    assert np.isfinite(float(v))

  def test_act_batched(self):
    agent = self._agent()
    a = agent.act(jax.random.PRNGKey(1), jnp.zeros((16, 4)),
                  obs_from_batch=True, num_simulations=8)
    assert a.shape == (16,)

  def test_network_helpers(self):
    agent = self._agent()
    s = agent.representation(jnp.zeros((2, 4)))
    pi_logits, v = agent.prediction(s)
    assert pi_logits.shape == (2, 2) and v.shape == (2,)
    r, ns = agent.dynamic(s, jnp.zeros(2, jnp.int32))
    assert r.shape == (2,) and ns.shape == s.shape

  def test_update_decreases_loss(self):
    agent = self._agent()
    batch = make_batch(jax.random.PRNGKey(2))
    losses = [agent.update(batch) for _ in range(30)]
    assert losses[-1] < losses[0]

  def test_save_load_roundtrip(self, tmp_path):
    agent = self._agent()
    batch = make_batch(jax.random.PRNGKey(2))
    agent.update(batch)
    path = str(tmp_path / "model.ckpt")
    agent.save(path)
    agent2 = self._agent()
    agent2.load(path)
    for a, b in zip(jax.tree.leaves(agent.params),
                    jax.tree.leaves(agent2.params)):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestStochasticMuZeroAgent:

  def _agent(self):
    networks = make_stochastic_mlp_networks(
        num_actions=2, num_chance_outcomes=4, embedding_dim=16,
        support_size=10, hidden=(32,))
    agent = StochasticMuZero(networks,
                             optimizer=create_optimizer("adam", 1e-3),
                             unroll_steps=4)
    agent.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    return agent

  def test_act(self):
    agent = self._agent()
    a, pi, v = agent.act(jax.random.PRNGKey(1), jnp.zeros(4),
                         with_pi=True, with_value=True, num_simulations=12)
    assert int(a) in (0, 1)
    assert pi.shape == (2,)
    np.testing.assert_allclose(float(jnp.sum(pi)), 1.0, rtol=1e-4)

  def test_update_decreases_loss(self):
    agent = self._agent()
    batch = make_batch(jax.random.PRNGKey(2))
    losses = [agent.update(batch) for _ in range(30)]
    assert losses[-1] < losses[0]

  def test_loss_components(self):
    networks = make_stochastic_mlp_networks(2, 4, 16, 10, hidden=(32,))
    params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    batch = make_batch(jax.random.PRNGKey(1))
    total, metrics = stochastic_muzero_loss(params, batch, networks)
    assert np.isfinite(float(total))
    for name in ("reward_loss", "value_loss", "policy_loss", "chance_loss",
                 "afterstate_value_loss", "commitment_loss"):
      assert np.isfinite(float(getattr(metrics, name))), name

  def test_afterstate_value_indexing_matches_reference(self):
    """The reference supervises the afterstate value against
    value_target[:, i-1] in a loop whose decision step is i-1
    (stochastic_muzero/learning.py:246-252, decision at s_{i-1} with
    action[:, i-1]); our loop indexes by the decision step directly and
    uses rn[:, i]. Mirror the reference's loop verbatim over the same
    networks and check the summed afterstate-value CE is identical —
    proving the two index conventions are the same quantity."""
    from muax_tpu.models.stochastic_networks import straight_through_code
    from muax_tpu.ops import scalar_to_support

    networks = make_stochastic_mlp_networks(2, 4, 16, 10, hidden=(32,))
    params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    batch = make_batch(jax.random.PRNGKey(1), B=8, L=5)
    support = networks.support_size
    L = batch.action.shape[1]

    def ce(logits, target_probs):
      return -jnp.sum(target_probs * jax.nn.log_softmax(logits, -1), -1)

    # Reference-convention unroll: i runs 1..L-1; the decision happens at
    # s_{i-1} with action[:, i-1]; av target is value_target[:, i-1].
    s = networks.representation.apply(params.representation, batch.obs[:, 0])
    av_ref = jnp.zeros(batch.action.shape[0])
    for i in range(1, L):
      code = straight_through_code(
          networks.encoder.apply(params.encoder, batch.obs[:, i]))
      ae, c_logit, av = networks.decision.apply(
          params.decision, s, batch.action[:, i - 1])
      av_ref += ce(av, scalar_to_support(batch.rn[:, i - 1], support))
      s, _ = networks.chance.apply(params.chance, ae, code)

    _, metrics = stochastic_muzero_loss(params, batch, networks)
    np.testing.assert_allclose(
        float(metrics.afterstate_value_loss),
        float(jnp.mean(av_ref / L)), rtol=1e-5)
