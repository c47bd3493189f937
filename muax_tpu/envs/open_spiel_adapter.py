"""open_spiel bridge: board games behind the host-pool escape hatch.

The reference's open_spiel path (examples/open_spiel/go/run_alphazero.py)
wraps pyspiel games in an acme OpenSpielWrapper subclass that builds the
AlphaZero 17-plane observation (8 x 2 board-history planes + a
current-player plane, run_alphazero.py:49-127) and searches them with the
host-Python MCTS over deep-copied simulators.

Here the split is TPU-native: pure-JAX board games (TicTacToe/ConnectFour)
run env-as-model AlphaZero search fully on device (train/selfplay.py);
arbitrary pyspiel games come through THIS bridge as a batched host pool —
the MuZero path with a learned model, where search happens in latent space
on device and only the real transition crosses the host boundary (one
io_callback per rollout step, like envs/gym_adapter.py). Rewards are
returned from the mover's perspective so the two-player value-flip
convention (discount < 0) applies unchanged.

``AlphaZeroPlanes`` (the observation builder) is dependency-free and
unit-tested against a fake game; ``OpenSpielVectorPool`` needs pyspiel and
raises a descriptive ImportError without it (pyspiel is not in this
image).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.experimental
import jax.numpy as jnp
import numpy as np

from muax_tpu.envs.base import AutoResetState, EnvSpec


class AlphaZeroPlanes:
  """Per-game stateful converter to the AlphaZero observation stack
  (reference run_alphazero.py:84-99): planes
  [black_0, white_0, black_1, white_1, ..., current_player], newest
  history first, zero-padded when the game is younger than the history.

  ``obs_extract(state) -> (black [H,W], white [H,W], player scalar)``
  adapts any game's observation tensor; the default handles the
  open_spiel Go/chess-style layout [H, W, >=4] with black at plane 0,
  white at plane 1, player at plane 3 (go.cc observation order).
  """

  def __init__(self, rows: int, cols: int, history_size: int = 8,
               obs_extract=None):
    self.rows, self.cols = rows, cols
    self.history_size = history_size
    self.num_planes = 2 * history_size + 1
    self._extract = obs_extract or self._default_extract
    self.reset()

  @staticmethod
  def _default_extract(tensor: np.ndarray, rows: int, cols: int):
    t = np.asarray(tensor, np.float32)
    if t.ndim != 3:
      # pyspiel ravels observation_tensor in observation_tensor_shape
      # order, which is plane-major [P, H, W] for go/chess/tic_tac_toe
      # (go.cc / chess.cc ObservationTensor) — reshape plane-major then
      # move planes last. (The reference example's channels-last reshape
      # at run_alphazero.py:90 scrambles real pyspiel planes; this is a
      # deliberate divergence, not a parity bug.)
      t = t.reshape(-1, rows, cols).transpose(1, 2, 0)
    elif t.shape[:2] == (rows, cols) and t.shape[1:] == (rows, cols):
      # [P, H, W] with P == H == W (e.g. a 3x3x3 tic-tac-toe tensor) is
      # indistinguishable from channels-last by shape alone; guessing
      # wrong scrambles the planes silently (ADVICE r4). Callers must
      # disambiguate: pass the FLAT observation_tensor (pyspiel's native
      # ravel, handled above) or an explicit obs_extract.
      raise ValueError(
          f"ambiguous {t.shape} observation for a {rows}x{cols} board: "
          "plane-major vs channels-last cannot be inferred when planes == "
          "rows; pass the flat observation_tensor or a custom obs_extract")
    elif t.shape[:2] != (rows, cols) and t.shape[1:] == (rows, cols):
      t = t.transpose(1, 2, 0)  # already 3-D but plane-major
    player = float(t[0, 0, 3]) if t.shape[-1] > 3 else 0.0
    return t[..., 0], t[..., 1], player

  def reset(self):
    self._history = []

  def observe(self, observation_tensor) -> np.ndarray:
    black, white, player = self._extract(observation_tensor, self.rows,
                                         self.cols)
    self._history.append((black, white, player))
    if len(self._history) > self.history_size:
      self._history.pop(0)
    out = np.zeros((self.rows, self.cols, self.num_planes), np.float32)
    for i, (b, w, _) in enumerate(reversed(self._history)):
      out[:, :, 2 * i] = b
      out[:, :, 2 * i + 1] = w
    out[:, :, -1] = self._history[-1][2]
    return out


class OpenSpielVectorPool:
  """N pyspiel game instances with host-side auto-reset behind one batched
  io_callback (the AutoResetWrapper interface; composes with
  make_rollout_fn / fit unchanged).

  Per step: the given action is applied FOR THE CURRENT PLAYER of each
  game; chance nodes are resolved by sampling; the returned reward is the
  mover's return delta (mover perspective — use a negative discount for
  the two-player value flip). ``legal_action_mask`` feeds the search's
  invalid-action masking.
  """

  def __init__(self, game_name: str, num_envs: int, seed: int = 0,
               history_size: int = 8,
               rows: Optional[int] = None, cols: Optional[int] = None):
    try:
      import pyspiel
    except ImportError as e:
      raise ImportError(
          "OpenSpielVectorPool needs open_spiel (`pip install "
          "open_spiel`); AlphaZeroPlanes (the observation builder) has no "
          "pyspiel dependency and is unit-tested against a fake game."
      ) from e
    self._init_common(pyspiel.load_game(game_name), num_envs, seed,
                      history_size, rows, cols)

  @classmethod
  def _from_game(cls, game, num_envs: int, seed: int = 0,
                 history_size: int = 8, rows=None, cols=None):
    """Test seam: build from any pyspiel-API-shaped game object."""
    self = cls.__new__(cls)
    self._init_common(game, num_envs, seed, history_size, rows, cols)
    return self

  def _init_common(self, game, num_envs, seed, history_size, rows, cols):
    self._game = game
    self.num_envs = num_envs
    self._rng = np.random.RandomState(seed)
    shape = tuple(game.observation_tensor_shape())
    if rows is None:
      # [planes, H, W] (open_spiel convention) or [H, W, planes].
      rows, cols = (shape[1], shape[2]) if len(shape) == 3 else (shape[0], 1)
    self._rows, self._cols = rows, cols
    self._planes = [AlphaZeroPlanes(rows, cols, history_size)
                    for _ in range(num_envs)]
    self._states = [None] * num_envs
    self._num_actions = int(game.num_distinct_actions())
    self.spec = EnvSpec(
        observation_shape=(rows, cols, 2 * history_size + 1),
        num_actions=self._num_actions,
        max_episode_steps=int(game.max_game_length()))

  # -- host side -----------------------------------------------------------
  def _obs_tensor(self, state):
    return np.asarray(state.observation_tensor(state.current_player()),
                      np.float32)

  def _resolve_chance(self, state):
    while (not state.is_terminal()) and state.is_chance_node():
      actions, probs = zip(*state.chance_outcomes())
      state.apply_action(self._rng.choice(actions, p=np.asarray(probs)))

  def _reset_one(self, i):
    state = self._game.new_initial_state()
    self._resolve_chance(state)
    self._states[i] = state
    self._planes[i].reset()
    return self._planes[i].observe(self._obs_tensor(state))

  def _host_reset_all(self):
    obs = np.zeros((self.num_envs,) + self.spec.observation_shape,
                   np.float32)
    for i in range(self.num_envs):
      obs[i] = self._reset_one(i)
    return obs

  def _host_step(self, action):
    action = np.asarray(action)
    obs = np.zeros((self.num_envs,) + self.spec.observation_shape,
                   np.float32)
    rew = np.zeros((self.num_envs,), np.float32)
    done = np.zeros((self.num_envs,), bool)
    for i in range(self.num_envs):
      state = self._states[i]
      mover = state.current_player()
      legal = state.legal_actions()
      a = int(action[i])
      if a not in legal:  # belt-and-braces; the search masks illegals
        a = int(legal[0])
      before = state.returns()[mover] if not state.is_terminal() else 0.0
      state.apply_action(a)
      self._resolve_chance(state)
      if state.is_terminal():
        rew[i] = state.returns()[mover] - before
        done[i] = True
        obs[i] = self._reset_one(i)
      else:
        rew[i] = state.returns()[mover] - before
        obs[i] = self._planes[i].observe(self._obs_tensor(state))
    return obs, rew, done

  def _host_legal_mask(self):
    mask = np.zeros((self.num_envs, self._num_actions), np.float32)
    for i, state in enumerate(self._states):
      mask[i, state.legal_actions()] = 1.0
    return mask

  # -- device-facing API (AutoResetWrapper-compatible) ---------------------
  def reset(self, rng: jax.Array, batch_size: int) -> AutoResetState:
    del rng
    if batch_size != self.num_envs:
      raise ValueError(f"batch_size {batch_size} != pool size "
                       f"{self.num_envs}")
    obs = jax.experimental.io_callback(
        self._host_reset_all,
        jax.ShapeDtypeStruct((self.num_envs,) + self.spec.observation_shape,
                             jnp.float32),
        ordered=True)
    return AutoResetState(
        env_state=(), obs=obs,
        episode_step=jnp.zeros(self.num_envs, jnp.int32),
        episode_return=jnp.zeros(self.num_envs, jnp.float32))

  def step(self, carry: AutoResetState, action: jax.Array, rng: jax.Array):
    del rng
    obs, reward, done = jax.experimental.io_callback(
        self._host_step,
        (jax.ShapeDtypeStruct((self.num_envs,) + self.spec.observation_shape,
                              jnp.float32),
         jax.ShapeDtypeStruct((self.num_envs,), jnp.float32),
         jax.ShapeDtypeStruct((self.num_envs,), jnp.bool_)),
        action, ordered=True)
    episode_return = carry.episode_return + reward
    new_carry = AutoResetState(
        env_state=(), obs=obs,
        episode_step=jnp.where(done, 0, carry.episode_step + 1),
        episode_return=jnp.where(done, 0.0, episode_return))
    info = {"terminated": done, "truncated": jnp.zeros_like(done),
            "episode_return": episode_return}
    return new_carry, reward, done, info

  def legal_action_mask(self, carry: AutoResetState) -> jax.Array:
    del carry  # host pools key legality off live host state
    return jax.experimental.io_callback(
        self._host_legal_mask,
        jax.ShapeDtypeStruct((self.num_envs, self._num_actions),
                             jnp.float32),
        ordered=True)
