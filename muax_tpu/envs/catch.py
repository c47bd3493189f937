"""Pure-JAX Catch (bsuite-style): a ball falls, a paddle catches it.

The engine's behavioral test bed — the reference's own search tests use
exactly this environment (acme/tf/mcts/search_test.py:28-95 with
catch.Catch(rows=2)) because the optimal action is provable.
"""
from __future__ import annotations

import flax.struct as struct
import jax
import jax.numpy as jnp

from muax_tpu.envs.base import Environment, EnvSpec


@struct.dataclass
class CatchState:
  ball_row: jax.Array
  ball_col: jax.Array
  paddle_col: jax.Array


class Catch(Environment):

  def __init__(self, rows: int = 10, columns: int = 5):
    self.rows = rows
    self.columns = columns
    self.spec = EnvSpec(observation_shape=(rows, columns), num_actions=3,
                        max_episode_steps=rows + 1)

  def reset(self, rng: jax.Array):
    ball_col = jax.random.randint(rng, (), 0, self.columns)
    state = CatchState(
        ball_row=jnp.asarray(0, jnp.int32),
        ball_col=ball_col.astype(jnp.int32),
        paddle_col=jnp.asarray(self.columns // 2, jnp.int32),
    )
    return state, self._obs(state)

  def step(self, state: CatchState, action: jax.Array):
    # Actions: 0 = left, 1 = stay, 2 = right.
    move = action.astype(jnp.int32) - 1
    paddle = jnp.clip(state.paddle_col + move, 0, self.columns - 1)
    ball_row = state.ball_row + 1
    new = CatchState(ball_row=ball_row, ball_col=state.ball_col,
                     paddle_col=paddle)
    done = ball_row >= self.rows - 1
    caught = paddle == state.ball_col
    reward = jnp.where(done, jnp.where(caught, 1.0, -1.0), 0.0)
    return new, self._obs(new), reward.astype(jnp.float32), done

  def _obs(self, state: CatchState) -> jax.Array:
    board = jnp.zeros((self.rows, self.columns), jnp.float32)
    ball_row = jnp.clip(state.ball_row, 0, self.rows - 1)
    board = board.at[ball_row, state.ball_col].set(1.0)
    board = board.at[self.rows - 1, state.paddle_col].set(1.0)
    return board
