"""Optimizer factories.

Parity with the reference's two idioms:
  * name-keyed factory with scheduler options
    (muax/optimizers.py:5-87 — adam/adamw/sgd/rmsprop/adagrad/lion +
    warmup_cosine_decay / exponential / cosine / polynomial schedules), and
  * the canonical muzero chain: warmup-exponential-decay schedule with
    global-norm clipping and adam scaling
    (muax/frameworks/coax/model.py:23-71).
"""
from __future__ import annotations

from typing import Optional, Sequence

import optax


def flatten_optimizer(
    optimizer: optax.GradientTransformation) -> optax.GradientTransformation:
  """Run any elementwise optax chain over ONE flat parameter vector.

  TPU throughput wrapper: a pytree of ~20 small arrays costs ~5 ops per
  leaf per adam step (moments, clip, schedule), which dominates the update
  for MuZero-scale nets inside the scanned learner. Raveling to a single
  vector collapses that to one fused elementwise chain. Numerically
  identical for elementwise transforms + global-norm clipping (the global
  norm of the vector IS the global norm of the tree)."""
  from jax.flatten_util import ravel_pytree

  def init(params):
    flat, _ = ravel_pytree(params)
    return optimizer.init(flat)

  def update(grads, state, params=None):
    flat_g, unravel = ravel_pytree(grads)
    flat_p = ravel_pytree(params)[0] if params is not None else None
    flat_u, state = optimizer.update(flat_g, state, flat_p)
    return unravel(flat_u), state

  return optax.GradientTransformation(init, update)


def muzero_optimizer(
    peak_lr: float = 2e-2,
    end_lr: float = 1e-3,
    warmup_steps: int = 1_000,
    transition_steps: int = 10_000,
    decay_rate: float = 0.8,
    clip_by_global_norm: float = 1.0,
    init_lr: float = 0.0,
    flatten: bool = True,
) -> optax.GradientTransformation:
  """The canonical muax optimizer chain (coax/model.py:23-71 defaults),
  applied over a flat parameter vector by default (see
  :func:`flatten_optimizer`; identical numerics, fewer ops)."""
  schedule = optax.warmup_exponential_decay_schedule(
      init_value=init_lr,
      peak_value=peak_lr,
      warmup_steps=warmup_steps,
      transition_steps=transition_steps,
      decay_rate=decay_rate,
      end_value=end_lr,
  )
  chain = optax.chain(
      optax.clip_by_global_norm(clip_by_global_norm),
      optax.scale_by_adam(),
      optax.scale_by_schedule(schedule),
      optax.scale(-1.0),
  )
  return flatten_optimizer(chain) if flatten else chain


def _create_scheduler(name: Optional[str], lr: float, **kwargs):
  if name is None:
    return lr
  if name == "warmup_cosine_decay":
    return optax.warmup_cosine_decay_schedule(
        init_value=kwargs.get("init_value", 0.0),
        peak_value=kwargs.get("peak_value", lr),
        warmup_steps=kwargs.get("warmup_steps", 1_000),
        decay_steps=kwargs.get("decay_steps", 10_000),
        end_value=kwargs.get("end_value", 0.0))
  if name == "exponential_decay":
    return optax.exponential_decay(
        init_value=lr,
        transition_steps=kwargs.get("transition_steps", 10_000),
        decay_rate=kwargs.get("decay_rate", 0.96),
        end_value=kwargs.get("end_value"))
  if name == "cosine_decay":
    return optax.cosine_decay_schedule(
        init_value=lr,
        decay_steps=kwargs.get("decay_steps", 10_000),
        alpha=kwargs.get("alpha", 0.0))
  if name == "polynomial":
    return optax.polynomial_schedule(
        init_value=lr,
        end_value=kwargs.get("end_value", 1e-4),
        power=kwargs.get("power", 1.0),
        transition_steps=kwargs.get("transition_steps", 10_000))
  if name == "piecewise_constant":
    return optax.piecewise_constant_schedule(
        init_value=lr,
        boundaries_and_scales=kwargs.get("boundaries_and_scales", {}))
  raise ValueError(f"Unknown scheduler: {name!r}")


_BASE_OPTIMIZERS = {
    "adam": optax.adam,
    "adamw": optax.adamw,
    "sgd": optax.sgd,
    "rmsprop": optax.rmsprop,
    "adagrad": optax.adagrad,
    "lion": optax.lion,
}


def create_optimizer(
    name: str = "adam",
    lr: float = 1e-3,
    scheduler: Optional[str] = None,
    extra_transforms: Sequence[optax.GradientTransformation] = (),
    **kwargs,
) -> optax.GradientTransformation:
  """Name-keyed optax builder (reference optimizers.py:5-36 behavior):
  optional gradient transforms are chained in front of the base optimizer."""
  if name not in _BASE_OPTIMIZERS:
    raise ValueError(
        f"Unknown optimizer {name!r}; choose from {sorted(_BASE_OPTIMIZERS)}")
  schedule = _create_scheduler(scheduler, lr, **kwargs)
  opt_kwargs = {}
  if name in ("sgd",) and "momentum" in kwargs:
    opt_kwargs["momentum"] = kwargs["momentum"]
  if name == "adamw" and "weight_decay" in kwargs:
    opt_kwargs["weight_decay"] = kwargs["weight_decay"]
  base = _BASE_OPTIMIZERS[name](schedule, **opt_kwargs)
  if extra_transforms:
    return optax.chain(*extra_transforms, base)
  return base
