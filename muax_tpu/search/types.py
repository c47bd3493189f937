"""Functional interfaces of the batched search engine.

The engine keeps the reference's functional seam (RootFnOutput /
RecurrentFnOutput, reference: muax/model.py:251-282 and
muax/frameworks/acme/jax/muzero/acting.py:58-108) so that any network plugs
in, and policies compose over a generic ``search()`` — the design requirement
proven by the reference's custom diffusion policy
(acme/jax/diffusion_muzero/policy.py:20-139).

All fields are batched on the leading axis B.
"""
from __future__ import annotations

from typing import Any, Callable, Generic, TypeVar

import flax.struct as struct
import jax

T = TypeVar("T")


@struct.dataclass
class RootFnOutput:
  """Output of root inference: repr -> pred on the current observation."""
  prior_logits: jax.Array   # [B, A]
  value: jax.Array          # [B]
  embedding: Any            # [B, ...] pytree


@struct.dataclass
class RecurrentFnOutput:
  """Output of one dynamics+prediction step inside the search."""
  reward: jax.Array         # [B]
  discount: jax.Array       # [B]
  prior_logits: jax.Array   # [B, A]
  value: jax.Array          # [B]


@struct.dataclass
class DecisionRecurrentFnOutput:
  """Stochastic MuZero decision step: (state, action) -> afterstate."""
  chance_logits: jax.Array     # [B, C]
  afterstate_value: jax.Array  # [B]


@struct.dataclass
class ChanceRecurrentFnOutput:
  """Stochastic MuZero chance step: (afterstate, outcome) -> next state."""
  action_logits: jax.Array  # [B, A]
  value: jax.Array          # [B]
  reward: jax.Array         # [B]


@struct.dataclass
class StochasticRecurrentState:
  """Embedding for the interleaved decision/chance search.

  ``state`` doubles as the afterstate embedding between decision and chance
  steps; ``is_decision_node`` flags which phase each batch element is in.
  """
  state: Any                 # [B, ...] latent (state or afterstate)
  is_decision_node: jax.Array  # [B] bool


@struct.dataclass
class PolicyOutput(Generic[T]):
  """What a search policy returns to the actor."""
  action: jax.Array          # [B]
  action_weights: jax.Array  # [B, A]
  search_tree: T


# recurrent_fn(params, rng, action [B], embedding) -> (RecurrentFnOutput, new_embedding)
RecurrentFn = Callable[[Any, jax.Array, jax.Array, Any],
                       tuple[RecurrentFnOutput, Any]]
# decision_recurrent_fn(params, rng, action, state) -> (DecisionRecurrentFnOutput, afterstate)
DecisionRecurrentFn = Callable[[Any, jax.Array, jax.Array, Any],
                               tuple[DecisionRecurrentFnOutput, Any]]
# chance_recurrent_fn(params, rng, outcome, afterstate) -> (ChanceRecurrentFnOutput, state)
ChanceRecurrentFn = Callable[[Any, jax.Array, jax.Array, Any],
                             tuple[ChanceRecurrentFnOutput, Any]]
