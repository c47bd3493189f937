"""The standalone Stochastic MuZero agent.

Parity with the reference's ``StochasticMuZero``
(frameworks/coax/model.py:486-903) and the acme SMZ agent
(acme/jax/stochastic_muzero): 5-network set, decision/chance search via the
engine's stochastic policy, VQ-VAE unrolled loss.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from muax_tpu.config import SearchConfig
from muax_tpu.models.optimizers import muzero_optimizer
from muax_tpu.models.stochastic_losses import stochastic_muzero_loss
from muax_tpu.models.stochastic_networks import SMZNetworks, SMZParams
from muax_tpu.ops import logits_to_scalar
from muax_tpu.search import (
    ChanceRecurrentFnOutput,
    DecisionRecurrentFnOutput,
    RootFnOutput,
    stochastic_muzero_policy,
)
from muax_tpu.train.checkpoint import load_pytree, save_pytree
from muax_tpu.types import Transition


class StochasticMuZero:

  def __init__(
      self,
      networks: SMZNetworks,
      optimizer: Optional[optax.GradientTransformation] = None,
      discount: float = 0.997,
      search_config: Optional[SearchConfig] = None,
      unroll_steps: int = 5,
      vqvae_beta: float = 0.25,
  ):
    self.networks = networks
    self.optimizer = optimizer or muzero_optimizer()
    self.discount = discount
    self.search = search_config or SearchConfig(
        policy="stochastic", num_simulations=200,
        num_chance_outcomes=networks.num_chance_outcomes)
    self.unroll_steps = unroll_steps
    self.vqvae_beta = vqvae_beta

    self.params: Optional[SMZParams] = None
    self.opt_state = None
    self._plan = jax.jit(self._plan_impl,
                         static_argnames=("num_simulations",))
    self._update = jax.jit(self._update_impl)

  def init(self, rng: jax.Array, sample_input: jax.Array) -> SMZParams:
    self.params = self.networks.init_params(rng, sample_input)
    self.opt_state = self.optimizer.init(self.params)
    return self.params

  # -- search bridge (acme/jax/stochastic_muzero/acting.py:80-130) --------
  def _root_fn(self, params: SMZParams, obs):
    state = self.networks.representation.apply(params.representation, obs)
    policy_logits, value_logits = self.networks.prediction.apply(
        params.prediction, state)
    return RootFnOutput(
        prior_logits=policy_logits,
        value=logits_to_scalar(value_logits, self.networks.support_size),
        embedding=state)

  def _decision_fn(self, params: SMZParams, rng, action, state):
    del rng
    afterstate, chance_logits, av_logits = self.networks.decision.apply(
        params.decision, state, action)
    out = DecisionRecurrentFnOutput(
        chance_logits=chance_logits,
        afterstate_value=logits_to_scalar(av_logits,
                                          self.networks.support_size))
    return out, afterstate

  def _chance_fn(self, params: SMZParams, rng, outcome, afterstate):
    del rng
    code = jax.nn.one_hot(outcome, self.networks.num_chance_outcomes,
                          dtype=afterstate.dtype)
    next_state, reward_logits = self.networks.chance.apply(
        params.chance, afterstate, code)
    policy_logits, value_logits = self.networks.prediction.apply(
        params.prediction, next_state)
    out = ChanceRecurrentFnOutput(
        action_logits=policy_logits,
        value=logits_to_scalar(value_logits, self.networks.support_size),
        reward=logits_to_scalar(reward_logits, self.networks.support_size))
    return out, next_state

  def _plan_impl(self, params, rng, obs, temperature, *, num_simulations):
    root = self._root_fn(params, obs)
    out = stochastic_muzero_policy(
        params, rng, root,
        decision_recurrent_fn=self._decision_fn,
        chance_recurrent_fn=self._chance_fn,
        num_simulations=num_simulations,
        num_chance_outcomes=self.networks.num_chance_outcomes,
        dirichlet_fraction=self.search.dirichlet_fraction,
        dirichlet_alpha=self.search.dirichlet_alpha,
        pb_c_init=self.search.pb_c_init,
        pb_c_base=self.search.pb_c_base,
        temperature=temperature,
        discount=self.discount)
    return out.action, out.action_weights, out.search_tree.summary().value

  def act(self, rng, obs, *, with_pi=False, with_value=False,
          obs_from_batch=False, num_simulations: int = 200,
          temperature: float = 1.0):
    obs = jnp.asarray(obs)
    if not obs_from_batch:
      obs = obs[None]
    action, pi, value = self._plan(
        self.params, rng, obs, jnp.asarray(temperature, jnp.float32),
        num_simulations=num_simulations)
    if not obs_from_batch:
      action, pi, value = action[0], pi[0], value[0]
    out = (action,)
    if with_pi:
      out += (pi,)
    if with_value:
      out += (value,)
    return out if len(out) > 1 else out[0]

  # -- learning -----------------------------------------------------------
  def _update_impl(self, params, opt_state, batch):
    def loss_fn(p):
      return stochastic_muzero_loss(
          p, batch, self.networks, num_unroll_steps=self.unroll_steps,
          vqvae_beta=self.vqvae_beta)

    grads, metrics = jax.grad(loss_fn, has_aux=True)(params)
    updates, opt_state = self.optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    params = params._replace(temperature=params.temperature)
    return params, opt_state, metrics

  def update(self, batch: Transition):
    self.params, self.opt_state, metrics = self._update(
        self.params, self.opt_state, batch)
    return jax.device_get(metrics.total)

  def save(self, path: str):
    save_pytree(path, {"params": self.params, "opt_state": self.opt_state})

  def load(self, path: str):
    ckpt = load_pytree(path)
    self.params = jax.tree.map(jnp.asarray, ckpt["params"])
    self.opt_state = ckpt["opt_state"]
    return self
