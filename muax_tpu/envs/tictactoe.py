"""Pure-JAX TicTacToe — the two-player zero-sum testbed.

Plays the role of the reference's open_spiel board-game path
(examples/open_spiel/go/run_alphazero.py) at a size where the optimal game
is known (perfect play draws): current-player-relative rewards, legal-action
masks, alternating to_play — the semantics the reference's OpenSpielNode /
zero_sum_transform encode (acme/tf/mcts/search.py:261-356, 452-453).

Observation: [3, 3, 2] planes (current player's stones, opponent's stones) —
always from the perspective of the player to move. Reward on termination is
+1/-1/0 from the perspective of the player who JUST moved.
"""
from __future__ import annotations

import flax.struct as struct
import jax
import numpy as np
import jax.numpy as jnp

from muax_tpu.envs.base import Environment, EnvSpec

# numpy (not jnp) so importing this module never initializes the XLA
# backend — required for jax.distributed.initialize-after-import
# (multi-host entry, parallel/multihost.py).
_LINES = np.asarray([
    [0, 1, 2], [3, 4, 5], [6, 7, 8],   # rows
    [0, 3, 6], [1, 4, 7], [2, 5, 8],   # cols
    [0, 4, 8], [2, 4, 6],              # diagonals
])


@struct.dataclass
class TicTacToeState:
  board: jax.Array    # [9] int8: 0 empty, 1 player0, 2 player1
  to_play: jax.Array  # int32: 0 or 1
  done: jax.Array     # bool


class TicTacToe(Environment):

  spec = EnvSpec(observation_shape=(3, 3, 2), num_actions=9,
                 max_episode_steps=9)

  def reset(self, rng):
    del rng
    state = TicTacToeState(board=jnp.zeros(9, jnp.int8),
                           to_play=jnp.asarray(0, jnp.int32),
                           done=jnp.asarray(False))
    return state, self.observation(state)

  def observation(self, state: TicTacToeState) -> jax.Array:
    """Planes relative to the player to move."""
    me = (state.board == state.to_play + 1).astype(jnp.float32)
    opp = (state.board == 2 - state.to_play).astype(jnp.float32)
    return jnp.stack([me.reshape(3, 3), opp.reshape(3, 3)], axis=-1)

  def legal_actions(self, state: TicTacToeState) -> jax.Array:
    """[9] 1.0 where the cell is empty (and the game is live)."""
    return jnp.where(state.done, 0.0,
                     (state.board == 0).astype(jnp.float32))

  def step(self, state: TicTacToeState, action):
    """Illegal moves (occupied cell / finished game) lose immediately —
    masked search never takes them, but the semantics stay total."""
    action = jnp.asarray(action, jnp.int32)
    illegal = jnp.logical_or(state.board[action] != 0, state.done)
    player_stone = (state.to_play + 1).astype(jnp.int8)
    board = state.board.at[action].set(
        jnp.where(illegal, state.board[action], player_stone))

    line_vals = board[_LINES]
    won = jnp.any(jnp.all(line_vals == player_stone, axis=1))
    full = jnp.all(board != 0)
    done = jnp.logical_or(jnp.logical_or(won, full), illegal)

    # Reward from the mover's perspective.
    reward = jnp.where(illegal, -1.0, jnp.where(won, 1.0, 0.0))
    new = TicTacToeState(board=board,
                         to_play=1 - state.to_play,
                         done=done)
    return new, self.observation(new), reward.astype(jnp.float32), done
