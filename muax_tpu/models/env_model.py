"""Learned environment models for observation-space planning.

TPU-native rebuild of the reference's env-model family
(acme/tf/mcts/models/{base,mlp,simulator}.py). The reference gives its
Python MCTS three "models" to walk: the real environment deep-copied per
simulation (simulator.py:137-193), an MLP transition model
(obs, a) -> (next_obs, reward, discount-logit) trained by online SGD from
an internal uniform replay inside every ``update()`` call (mlp.py:32-219),
and a latent twin (ReprMLPModel, mlp.py:222-365). Here all three become
pure functions that plug into the batched search engine's RecurrentFn seam:

- ``make_simulator_recurrent_fn``: the env IS the model. Embeddings in the
  tree are batched env-state pytrees, so "checkpoint/restore" (the
  deepcopy dance at simulator.py:163-177) is free — the parent's state is
  immutable in HBM and every child just carries its own.
- ``make_mlp_transition_model`` + ``make_model_recurrent_fn``: a learned
  model searched in observation space. Termination is the learned
  continue-bit: the reference stops an episode when sigmoid(discount) <
  tolerance (mlp.py:204-210); here that becomes a per-node discount of 0,
  which cuts the subtree identically without host control flow.
- the latent variant is the MuZero dynamics path itself
  (models/networks.py) and is not duplicated.

The model's internal replay (mlp.py:106-135: ring of 1000, minibatch 16 per
update) becomes a device-resident transition ring with jitted add/sample.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import flax.struct as struct
import haiku as hk
import jax
import jax.numpy as jnp
import optax

from muax_tpu.envs.base import Environment
from muax_tpu.search import RecurrentFnOutput, RootFnOutput, muzero_policy


class EnvModel(NamedTuple):
  """Learned transition model.

  network: (obs [B, ...], action [B]) ->
      (next_obs [B, ...], reward [B], continue_logit [B])
  """
  network: hk.Transformed
  num_actions: int

  def init_params(self, rng: jax.Array, sample_obs: jax.Array):
    return self.network.init(rng, sample_obs,
                             jnp.zeros((sample_obs.shape[0],), jnp.int32))

  def apply(self, params, obs: jax.Array, action: jax.Array):
    return self.network.apply(params, obs, action)


def make_mlp_transition_model(num_actions: int,
                              observation_shape: Tuple[int, ...],
                              hidden: Sequence[int] = (64, 64),
                              residual: bool = True) -> EnvModel:
  """MLP (obs ⊕ one_hot(a)) -> (next_obs, reward, continue_logit).

  Parity: MLPTransitionModel (mlp.py:32-103). ``residual=True`` predicts the
  observation delta — same capability, better conditioning on near-identity
  dynamics.
  """
  obs_size = 1
  for d in observation_shape:
    obs_size *= d

  def network(obs, action):
    flat = hk.Flatten()(obs.astype(jnp.float32))
    inputs = jnp.concatenate(
        [flat, jax.nn.one_hot(action, num_actions)], axis=-1)

    # Each head gets its own independent hidden stack, matching the
    # reference's three separate MLPs (mlp.py:48-59) — no gradient coupling
    # through a shared trunk.
    def tower(name, out_size):
      h = inputs
      for i, size in enumerate(hidden):
        h = jax.nn.relu(hk.Linear(size, name=f"{name}_h{i}")(h))
      return hk.Linear(out_size, name=f"{name}_out")(h)

    next_flat = tower("obs", obs_size)
    if residual:
      next_flat = next_flat + flat
    reward = tower("reward", 1)[..., 0]
    continue_logit = tower("continue", 1)[..., 0]
    next_obs = next_flat.reshape(obs.shape[:1] + tuple(observation_shape))
    return next_obs, reward, continue_logit

  return EnvModel(network=hk.without_apply_rng(hk.transform(network)),
                  num_actions=num_actions)


# --------------------------------------------------------------------------
# Device-resident transition ring (the model's internal replay,
# mlp.py:106-135) — uniform sampling, jitted add with wraparound.
# --------------------------------------------------------------------------


@struct.dataclass
class ModelReplayState:
  obs: jax.Array        # [C, ...]
  action: jax.Array     # [C]
  reward: jax.Array     # [C]
  next_obs: jax.Array   # [C, ...]
  done: jax.Array       # [C]
  cursor: jax.Array     # scalar int32
  size: jax.Array       # scalar int32
  capacity: int = struct.field(pytree_node=False)


def model_replay_init(capacity: int, observation_shape: Tuple[int, ...],
                      obs_dtype=jnp.float32) -> ModelReplayState:
  shape = (capacity,) + tuple(observation_shape)
  return ModelReplayState(
      obs=jnp.zeros(shape, obs_dtype),
      action=jnp.zeros((capacity,), jnp.int32),
      reward=jnp.zeros((capacity,), jnp.float32),
      next_obs=jnp.zeros(shape, obs_dtype),
      done=jnp.zeros((capacity,), jnp.bool_),
      cursor=jnp.asarray(0, jnp.int32),
      size=jnp.asarray(0, jnp.int32),
      capacity=capacity)


def model_replay_add(state: ModelReplayState, obs, action, reward, next_obs,
                     done) -> ModelReplayState:
  """Insert K transitions (leading axis K) at the ring cursor.

  K > capacity would create duplicate scatter indices (unspecified winner in
  XLA); keep only the newest ``capacity`` rows so 'last K survive' holds.
  """
  if action.shape[0] > state.capacity:
    obs, action, reward, next_obs, done = jax.tree.map(
        lambda x: x[-state.capacity:], (obs, action, reward, next_obs, done))
  k = action.shape[0]
  idx = (state.cursor + jnp.arange(k)) % state.capacity
  return state.replace(
      obs=state.obs.at[idx].set(obs),
      action=state.action.at[idx].set(action.astype(jnp.int32)),
      reward=state.reward.at[idx].set(reward.astype(jnp.float32)),
      next_obs=state.next_obs.at[idx].set(next_obs),
      done=state.done.at[idx].set(done),
      cursor=(state.cursor + k) % state.capacity,
      size=jnp.minimum(state.size + k, state.capacity))


def model_replay_sample(state: ModelReplayState, rng: jax.Array,
                        batch_size: int):
  """Uniform minibatch over filled slots (mlp.py samples uniformly)."""
  idx = jax.random.randint(rng, (batch_size,), 0,
                           jnp.maximum(state.size, 1))
  return (state.obs[idx], state.action[idx], state.reward[idx],
          state.next_obs[idx], state.done[idx])


# --------------------------------------------------------------------------
# Online model learning (the SGD inside Model.update(), mlp.py:167-200).
# --------------------------------------------------------------------------


def env_model_loss(params, model: EnvModel, obs, action, reward, next_obs,
                   done):
  """MSE(next_obs) + MSE(reward) + BCE(continue vs ¬done).

  Mirrors the reference's three heads; the discount logit there encodes
  episode continuation (terminal when sigmoid < tol, mlp.py:204-210).
  """
  pred_next, pred_reward, continue_logit = model.apply(params, obs, action)
  obs_loss = jnp.mean(jnp.square(pred_next - next_obs))
  reward_loss = jnp.mean(jnp.square(pred_reward - reward))
  continue_target = 1.0 - done.astype(jnp.float32)
  continue_loss = jnp.mean(optax.sigmoid_binary_cross_entropy(
      continue_logit, continue_target))
  return obs_loss + reward_loss + continue_loss, {
      "model_obs_loss": obs_loss,
      "model_reward_loss": reward_loss,
      "model_continue_loss": continue_loss,
  }


def make_model_update_fn(model: EnvModel, optimizer: optax.GradientTransformation,
                         batch_size: int = 16, num_sgd_steps: int = 1):
  """Jitted online update: sample uniform minibatch(es) from the model ring
  and take SGD steps — the body of Model.update() (mlp.py:167-200), minus
  the host loop."""

  def one_step(carry, rng):
    params, opt_state, replay_state = carry
    batch = model_replay_sample(replay_state, rng, batch_size)
    (loss, metrics), grads = jax.value_and_grad(
        env_model_loss, has_aux=True)(params, model, *batch)
    # Underfilled ring: an update before `batch_size` real transitions exist
    # would train on zero-initialized slots — zero the step instead (the
    # reference's `if self._replay.size >= self._batch_size` gate,
    # mlp.py:196).
    ready = (replay_state.size >= batch_size).astype(jnp.float32)
    grads = jax.tree.map(lambda g: g * ready, grads)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    metrics = dict(metrics, model_loss=loss * ready)
    return (params, opt_state, replay_state), metrics

  def update(params, opt_state, replay_state: ModelReplayState,
             rng: jax.Array):
    rngs = jax.random.split(rng, num_sgd_steps)
    (params, opt_state, _), metrics = jax.lax.scan(
        one_step, (params, opt_state, replay_state), rngs)
    return params, opt_state, jax.tree.map(lambda m: m[-1], metrics)

  return update


# --------------------------------------------------------------------------
# Search adapters: RecurrentFn over the learned model / the real env.
# --------------------------------------------------------------------------


class ModelSearchParams(NamedTuple):
  """Bundles the evaluation net's params (AZParams) with the transition
  model's params for the search."""
  network: Any
  model: Any


def make_model_recurrent_fn(model: EnvModel, network,
                            discount: float = 1.0,
                            terminal_tol: float = 0.1):
  """Search dynamics = the learned model; embeddings are observations.

  Parity: MLPModel.step + needs_reset (mlp.py:139-219) driving the tree
  walk, with the policy/value ``network`` (AZNetwork) evaluating leaves.
  A predicted-terminal node (sigmoid(continue) < tol) gets discount 0 —
  the batched equivalent of the reference ending the simulated episode.
  """

  def recurrent_fn(params: ModelSearchParams, rng, action, embedding):
    del rng
    obs = embedding
    next_obs, reward, continue_logit = model.apply(params.model, obs, action)
    alive = jax.nn.sigmoid(continue_logit) >= terminal_tol
    policy_logits, value = network.apply(params.network, next_obs)
    out = RecurrentFnOutput(
        reward=reward,
        discount=jnp.where(alive, discount, 0.0),
        prior_logits=policy_logits,
        value=jnp.where(alive, value, 0.0),
    )
    return out, next_obs

  return recurrent_fn


def make_simulator_recurrent_fn(env: Environment, network,
                                discount: float = 1.0):
  """Single-player env-as-model (simulator.py semantics; the two-player
  flip lives in train/selfplay.py). Embeddings are env-state pytrees."""

  def recurrent_fn(params, rng, action, embedding):
    del rng
    new_state, obs, reward, done = jax.vmap(env.step)(embedding, action)
    policy_logits, value = network.apply(params, obs)
    out = RecurrentFnOutput(
        reward=reward,
        discount=jnp.where(done, 0.0, discount),
        prior_logits=policy_logits,
        value=jnp.where(done, 0.0, value),
    )
    return out, new_state

  return recurrent_fn


def make_model_policy_fn(model: EnvModel, network,
                         num_simulations: int = 64,
                         discount: float = 1.0,
                         terminal_tol: float = 0.1,
                         dirichlet_fraction: float = 0.25,
                         dirichlet_alpha: float = 0.3,
                         max_depth: Optional[int] = None):
  """(search_params, rng, obs [B, ...], temperature) ->
  (action, pi, root_value): batched MCTS over the learned model — the
  MCTSActor-with-MLPModel path (acting.py:35-157 + mlp.py)."""
  recurrent_fn = make_model_recurrent_fn(model, network, discount,
                                         terminal_tol)

  def policy_fn(params: ModelSearchParams, rng, obs, temperature):
    policy_logits, value = network.apply(params.network, obs)
    root = RootFnOutput(prior_logits=policy_logits, value=value,
                        embedding=obs)
    out = muzero_policy(
        params, rng, root, recurrent_fn, num_simulations,
        max_depth=max_depth, dirichlet_fraction=dirichlet_fraction,
        dirichlet_alpha=dirichlet_alpha, temperature=temperature)
    summary = out.search_tree.summary()
    return out.action, out.action_weights, summary.value

  return policy_fn


def make_simulator_policy_fn(env: Environment, network,
                             num_simulations: int = 64,
                             discount: float = 1.0,
                             dirichlet_fraction: float = 0.25,
                             dirichlet_alpha: float = 0.3,
                             max_depth: Optional[int] = None):
  """Batched MCTS over the REAL env (single-player Simulator path,
  run_mcts.py:44-104 with --simulator). Takes batched env states plus the
  matching observations (the env API keeps obs alongside state)."""
  recurrent_fn = make_simulator_recurrent_fn(env, network, discount)

  def policy_fn(params, rng, state, obs, temperature):
    policy_logits, value = network.apply(params, obs)
    root = RootFnOutput(prior_logits=policy_logits, value=value,
                        embedding=state)
    out = muzero_policy(
        params, rng, root, recurrent_fn, num_simulations,
        max_depth=max_depth, dirichlet_fraction=dirichlet_fraction,
        dirichlet_alpha=dirichlet_alpha, temperature=temperature)
    summary = out.search_tree.summary()
    return out.action, out.action_weights, summary.value

  return policy_fn
