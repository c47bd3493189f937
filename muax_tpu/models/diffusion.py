"""SDE / flow-matching library for diffusion MuZero.

Capability parity with the reference's diffusion model library
(acme/jax/diffusion_muzero/diffusion_model/sde_lib.py:10-230): an ``SDE``
base class (marginal_prob / prior_sampling / prior_logp / Euler-Maruyama
discretization / reverse-SDE-or-probability-flow-ODE) and a
``RectifiedFlow`` instance (zero drift, sigma_t = (1 - t) * sigma, Gaussian
prior, Euler ODE sampler, reflow pair generation), plus the flow-matching
training loss and the ``batch_mul``/``batch_add`` helpers
(diffusion_model/utils.py:37-110).

Convention: t runs 0 -> 1 from the prior to the data, so
``x_t = t * x0 + (1 - t) * sigma * eps`` and the target velocity of the
straight transport path is ``x0 - sigma * eps``. Samplers integrate the
learned velocity field from t=0 to t=1.

TPU notes: the sampler is a ``lax.fori_loop`` over a static number of steps;
each step is one batched network evaluation (MXU) — no host round-trips.
"""
from __future__ import annotations

import abc
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

VelocityFn = Callable[[jax.Array, jax.Array, Any], jax.Array]


def batch_mul(a: jax.Array, b: jax.Array) -> jax.Array:
  """Multiply a per-example vector ``a [B]`` into ``b [B, ...]``."""
  return a.reshape(a.shape + (1,) * (b.ndim - a.ndim)) * b


def batch_add(a: jax.Array, b: jax.Array) -> jax.Array:
  """Add a per-example vector ``a [B]`` onto ``b [B, ...]``."""
  return a.reshape(a.shape + (1,) * (b.ndim - a.ndim)) + b


class SDE(abc.ABC):
  """Forward SDE ``dx = f(x, t) dt + g(t) dw`` on t in [0, 1]."""

  def __init__(self, num_steps: int = 100):
    self.num_steps = int(num_steps)

  @abc.abstractmethod
  def sde(self, x: jax.Array, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Drift f(x, t) [B, ...] and diffusion g(t) [B]."""

  @abc.abstractmethod
  def marginal_prob(self, x0: jax.Array,
                    t: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Mean [B, ...] and std [B] of x_t | x0."""

  @abc.abstractmethod
  def prior_sampling(self, rng: jax.Array, shape) -> jax.Array:
    """Draw from the t=0 prior."""

  @abc.abstractmethod
  def prior_logp(self, z: jax.Array) -> jax.Array:
    """Log-density of the prior at z, reduced over non-batch dims -> [B]."""

  def discretize(self, x: jax.Array,
                 t: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """One Euler-Maruyama step: returns (f(x,t)*dt, g(t)*sqrt(dt))."""
    dt = 1.0 / self.num_steps
    drift, diffusion = self.sde(x, t)
    return drift * dt, diffusion * jnp.sqrt(dt)

  def reverse(self, score_fn: Callable, probability_flow: bool = False):
    """Reverse-time process: the reverse SDE
    ``dx = [f - g^2 score] dt + g dw`` or the probability-flow ODE
    ``dx = [f - 0.5 g^2 score] dt`` (zero diffusion)."""
    fwd_sde, num_steps = self.sde, self.num_steps

    class _Reverse:

      def sde(self, x, t):
        drift, diffusion = fwd_sde(x, t)
        scale = 0.5 if probability_flow else 1.0
        rev_drift = drift - scale * batch_mul(diffusion**2,
                                              score_fn(x, t))
        rev_diffusion = (jnp.zeros_like(diffusion)
                         if probability_flow else diffusion)
        return rev_drift, rev_diffusion

      def discretize(self, x, t):
        dt = 1.0 / num_steps
        drift, diffusion = self.sde(x, t)
        return drift * dt, diffusion * jnp.sqrt(dt)

    return _Reverse()


class RectifiedFlow(SDE):
  """Straight-path transport N(0, sigma^2) -> data (reference
  sde_lib.py:115-230): zero drift, sigma_t = (1 - t) * sigma."""

  def __init__(self, sigma: float = 1.0, num_steps: int = 100):
    super().__init__(num_steps=num_steps)
    self.sigma = float(sigma)

  def sde(self, x, t):
    return jnp.zeros_like(x), jnp.zeros(x.shape[0], x.dtype)

  def marginal_prob(self, x0, t):
    mean = batch_mul(t, x0)
    std = (1.0 - t) * self.sigma
    return mean, std

  def prior_sampling(self, rng, shape):
    return self.sigma * jax.random.normal(rng, shape)

  def prior_logp(self, z):
    dims = int(jnp.prod(jnp.asarray(z.shape[1:])))
    quad = jnp.sum(jnp.square(z.reshape(z.shape[0], -1)), axis=-1)
    return (-0.5 * dims * jnp.log(2 * jnp.pi * self.sigma**2)
            - quad / (2 * self.sigma**2))

  def euler_ode(self, velocity_fn: VelocityFn, rng: jax.Array, shape,
                cond: Any = None, num_steps: Optional[int] = None
                ) -> jax.Array:
    """Integrate dx/dt = v(x, t, cond) from the prior (t=0) to t=1 with a
    fixed-step Euler scheme (reference's euler_ode sampler)."""
    steps = int(num_steps or self.num_steps)
    dt = 1.0 / steps
    x0 = self.prior_sampling(rng, shape)

    def body(i, x):
      t = jnp.full((shape[0],), i * dt, x.dtype)
      return x + dt * velocity_fn(x, t, cond)

    return jax.lax.fori_loop(0, steps, body, x0)

  def reflow_pairs(self, velocity_fn: VelocityFn, rng: jax.Array, shape,
                   cond: Any = None) -> Tuple[jax.Array, jax.Array]:
    """(noise, generated sample) couplings for reflow retraining — the
    straightening hook the reference exposes (sde_lib.py reflow)."""
    steps, dt = self.num_steps, 1.0 / self.num_steps
    z = self.prior_sampling(rng, shape)

    def body(i, x):
      t = jnp.full((shape[0],), i * dt, x.dtype)
      return x + dt * velocity_fn(x, t, cond)

    return z, jax.lax.fori_loop(0, steps, body, z)


def flow_matching_loss(velocity_fn: VelocityFn, rng: jax.Array,
                       x0: jax.Array, *, flow: RectifiedFlow,
                       cond: Any = None) -> jax.Array:
  """Rectified-flow matching: regress the velocity net onto the straight
  path's constant velocity ``x0 - sigma * eps`` at a random time."""
  t_rng, eps_rng = jax.random.split(rng)
  batch = x0.shape[0]
  t = jax.random.uniform(t_rng, (batch,), x0.dtype)
  eps = jax.random.normal(eps_rng, x0.shape, x0.dtype)
  mean, std = flow.marginal_prob(x0, t)
  x_t = mean + batch_mul(std, eps)
  target = x0 - flow.sigma * eps
  pred = velocity_fn(x_t, t, cond)
  return jnp.mean(jnp.square(pred - target))
