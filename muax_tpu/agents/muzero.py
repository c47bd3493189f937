"""The standalone MuZero agent — host-facing convenience API.

Capability parity with the reference's ``MuZero`` class (muax/model.py:62-212
and the coax twin at frameworks/coax/model.py:74-483): holds the network
triplet, search policy, optimizer and loss; exposes ``init / act / update /
save / load`` plus ``representation / prediction / dynamic`` helpers. Unlike
the reference, ``act`` is natively batched — pass [B, ...] observations and
the search runs as one device program (B=1 still works via
``obs_from_batch=False``).
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from muax_tpu.config import MuZeroConfig, SearchConfig
from muax_tpu.models.losses import muzero_loss
from muax_tpu.models.networks import MZNetworks, MZParams
from muax_tpu.models.optimizers import muzero_optimizer
from muax_tpu.ops import logits_to_scalar
from muax_tpu.search import gumbel_muzero_policy, muzero_policy
from muax_tpu.train.checkpoint import load_pytree, save_pytree
from muax_tpu.train.inference import make_recurrent_fn, make_root_fn
from muax_tpu.types import Transition


class MuZero:
  """Network triplet + search policy + optimizer, bundled for host loops."""

  def __init__(
      self,
      networks: MZNetworks,
      policy: str = "muzero",
      optimizer: Optional[optax.GradientTransformation] = None,
      discount: float = 0.997,
      search_config: Optional[SearchConfig] = None,
      unroll_steps: int = 5,
  ):
    self.networks = networks
    self.optimizer = optimizer or muzero_optimizer()
    self.discount = discount
    self.search = search_config or SearchConfig(policy=policy)
    self.search.policy = policy
    self.unroll_steps = unroll_steps

    self._root_fn = make_root_fn(networks)
    self._recurrent_fn = make_recurrent_fn(networks, discount)
    self._repr_apply = jax.jit(networks.representation.apply)
    self._pred_apply = jax.jit(networks.prediction.apply)
    self._dy_apply = jax.jit(networks.dynamic.apply)

    self.params: Optional[MZParams] = None
    self.opt_state = None

    self._plan = jax.jit(self._plan_impl, static_argnames=(
        "num_simulations", "max_depth"))
    self._update = jax.jit(self._update_impl)

  # -- init ---------------------------------------------------------------
  def init(self, rng: jax.Array, sample_input: jax.Array) -> MZParams:
    """sample_input: [B, ...] observation batch (reference model.py:62-80)."""
    self.params = self.networks.init_params(rng, sample_input)
    self.opt_state = self.optimizer.init(self.params)
    return self.params

  # -- acting -------------------------------------------------------------
  def _plan_impl(self, params, rng, obs, temperature, *, num_simulations,
                 max_depth):
    root = self._root_fn(params, obs)
    if self.search.policy == "gumbel":
      out = gumbel_muzero_policy(
          params, rng, root, self._recurrent_fn,
          num_simulations=num_simulations, max_depth=max_depth,
          max_num_considered_actions=self.search.max_num_considered_actions,
          gumbel_scale=self.search.gumbel_scale)
    else:
      out = muzero_policy(
          params, rng, root, self._recurrent_fn,
          num_simulations=num_simulations, max_depth=max_depth,
          dirichlet_fraction=self.search.dirichlet_fraction,
          dirichlet_alpha=self.search.dirichlet_alpha,
          pb_c_init=self.search.pb_c_init,
          pb_c_base=self.search.pb_c_base,
          temperature=temperature)
    return out.action, out.action_weights, out.search_tree.summary().value

  def act(self, rng: jax.Array, obs, *, with_pi: bool = False,
          with_value: bool = False, obs_from_batch: bool = False,
          num_simulations: int = 50, temperature: float = 1.0,
          max_depth: Optional[int] = None):
    """Plan and return action (and optionally pi / root value).

    Mirrors ``MuZero.act`` (model.py:82-179): unbatched observations are
    expanded to B=1 and results squeezed back.
    """
    obs = jnp.asarray(obs)
    if not obs_from_batch:
      obs = obs[None]
    action, pi, value = self._plan(
        self.params, rng, obs, jnp.asarray(temperature, jnp.float32),
        num_simulations=num_simulations, max_depth=max_depth)
    if not obs_from_batch:
      action, pi, value = action[0], pi[0], value[0]
    out = (action,)
    if with_pi:
      out = out + (pi,)
    if with_value:
      out = out + (value,)
    return out if len(out) > 1 else out[0]

  # -- network helpers (coax API parity, coax/model.py:74-483) ------------
  def representation(self, obs):
    return self._repr_apply(self.params.representation, jnp.asarray(obs))

  def prediction(self, embedding):
    policy_logits, value_logits = self._pred_apply(
        self.params.prediction, embedding)
    return policy_logits, logits_to_scalar(value_logits,
                                           self.networks.support_size)

  def dynamic(self, embedding, action):
    reward_logits, next_embedding = self._dy_apply(
        self.params.dynamic, embedding, jnp.asarray(action))
    return logits_to_scalar(reward_logits,
                            self.networks.support_size), next_embedding

  # -- learning -----------------------------------------------------------
  def _update_impl(self, params, opt_state, batch):
    def loss_fn(p):
      return muzero_loss(p, batch, self.networks,
                         num_unroll_steps=self.unroll_steps)

    grads, metrics = jax.grad(loss_fn, has_aux=True)(params)
    updates, opt_state = self.optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    params = params._replace(temperature=params.temperature)
    return params, opt_state, metrics

  def update(self, batch: Transition):
    """One gradient step on a sampled [B, L, ...] batch; returns metrics
    (reference model.py:181-201)."""
    self.params, self.opt_state, metrics = self._update(
        self.params, self.opt_state, batch)
    return jax.device_get(metrics.total)

  # -- checkpointing (model.py:203-212 / coax save-load split) ------------
  def save(self, path: str):
    save_pytree(path, {"params": self.params, "opt_state": self.opt_state})

  def load(self, path: str):
    ckpt = load_pytree(path)
    self.params = jax.tree.map(jnp.asarray, ckpt["params"])
    if isinstance(self.params, (list, tuple)) and not isinstance(
        self.params, MZParams):
      self.params = MZParams(*self.params)
    self.opt_state = ckpt["opt_state"]
    return self
