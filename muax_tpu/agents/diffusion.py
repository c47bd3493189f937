"""The standalone Diffusion MuZero agent.

Completes the reference's WIP diffusion family (acme/jax/diffusion_muzero:
policy.py is functional, learning.py trains the chance net on the continuous
code at :229, but the SDE model is never trained): plan with
``search.diffusion_policy.diffusion_muzero_policy`` over flow-sampled
next-state candidates, learn with ``models.diffusion_losses`` (flow matching
inside the k-step unroll). Same public surface as agents.MuZero /
agents.StochasticMuZero: init / act / update / save / load.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from muax_tpu.config import SearchConfig
from muax_tpu.models.diffusion_losses import diffusion_muzero_loss
from muax_tpu.models.diffusion_networks import DMZNetworks, DMZParams
from muax_tpu.models.optimizers import muzero_optimizer
from muax_tpu.ops import logits_to_scalar
from muax_tpu.search import (
    ChanceRecurrentFnOutput,
    DecisionRecurrentFnOutput,
    RootFnOutput,
)
from muax_tpu.search.diffusion_policy import diffusion_muzero_policy
from muax_tpu.train.checkpoint import load_pytree, save_pytree
from muax_tpu.types import Transition


class DiffusionMuZero:

  def __init__(
      self,
      networks: DMZNetworks,
      optimizer: Optional[optax.GradientTransformation] = None,
      discount: float = 0.997,
      search_config: Optional[SearchConfig] = None,
      unroll_steps: int = 5,
      flow_coef: float = 1.0,
  ):
    self.networks = networks
    self.optimizer = optimizer or muzero_optimizer()
    self.discount = discount
    self.search = search_config or SearchConfig(
        policy="stochastic", num_simulations=50)
    self.unroll_steps = unroll_steps
    self.flow_coef = flow_coef

    self.params: Optional[DMZParams] = None
    self.opt_state = None
    self._plan = jax.jit(self._plan_impl,
                         static_argnames=("num_simulations",))
    self._update = jax.jit(self._update_impl)

  def init(self, rng: jax.Array, sample_input: jax.Array) -> DMZParams:
    self.params = self.networks.init_params(rng, sample_input)
    self.opt_state = self.optimizer.init(self.params)
    return self.params

  # -- search bridge (diffusion_muzero/policy.py interfaces) ---------------
  def _root_fn(self, params: DMZParams, obs):
    state = self.networks.representation.apply(params.representation, obs)
    policy_logits, value_logits = self.networks.prediction.apply(
        params.prediction, state)
    return RootFnOutput(
        prior_logits=policy_logits,
        value=logits_to_scalar(value_logits, self.networks.support_size),
        embedding=state)

  def _decision_fn(self, params: DMZParams, rng, action, state):
    del rng
    afterstate, av_logits = self.networks.decision.apply(
        params.decision, state, action)
    # Candidates are exchangeable flow samples -> uniform chance prior.
    chance_logits = jnp.zeros(
        (state.shape[0], self.networks.num_samples), state.dtype)
    out = DecisionRecurrentFnOutput(
        chance_logits=chance_logits,
        afterstate_value=logits_to_scalar(av_logits,
                                          self.networks.support_size))
    return out, afterstate

  def _sample_fn(self, params: DMZParams, rng, afterstate):
    return self.networks.sample_candidates(params, rng, afterstate)

  def _chance_eval_fn(self, params: DMZParams, rng, next_state):
    del rng
    policy_logits, value_logits = self.networks.prediction.apply(
        params.prediction, next_state)
    reward_logits = self.networks.reward.apply(params.reward, next_state)
    return ChanceRecurrentFnOutput(
        action_logits=policy_logits,
        value=logits_to_scalar(value_logits, self.networks.support_size),
        reward=logits_to_scalar(reward_logits, self.networks.support_size))

  def _plan_impl(self, params, rng, obs, temperature, *, num_simulations):
    root = self._root_fn(params, obs)
    out = diffusion_muzero_policy(
        params, rng, root,
        decision_recurrent_fn=self._decision_fn,
        sample_fn=self._sample_fn,
        chance_eval_fn=self._chance_eval_fn,
        num_simulations=num_simulations,
        num_samples=self.networks.num_samples,
        dirichlet_fraction=self.search.dirichlet_fraction,
        dirichlet_alpha=self.search.dirichlet_alpha,
        pb_c_init=self.search.pb_c_init,
        pb_c_base=self.search.pb_c_base,
        temperature=temperature,
        discount=self.discount)
    return out.action, out.action_weights, out.search_tree.summary().value

  def act(self, rng, obs, *, with_pi=False, with_value=False,
          obs_from_batch=False, num_simulations: int = 50,
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

  # -- learning -------------------------------------------------------------
  def _update_impl(self, params, opt_state, batch, rng):
    def loss_fn(p):
      return diffusion_muzero_loss(
          p, batch, self.networks, rng,
          num_unroll_steps=self.unroll_steps, flow_coef=self.flow_coef)

    grads, metrics = jax.grad(loss_fn, has_aux=True)(params)
    updates, opt_state = self.optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, metrics

  def update(self, batch: Transition, rng: Optional[jax.Array] = None):
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    self.params, self.opt_state, metrics = self._update(
        self.params, self.opt_state, batch, rng)
    return jax.device_get(metrics.total)

  def save(self, path: str):
    save_pytree(path, {"params": self.params, "opt_state": self.opt_state})

  def load(self, path: str):
    ckpt = load_pytree(path)
    self.params = jax.tree.map(jnp.asarray, ckpt["params"])
    self.opt_state = ckpt["opt_state"]
    return self
