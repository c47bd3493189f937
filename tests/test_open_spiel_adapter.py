"""open_spiel bridge (reference examples/open_spiel/go/run_alphazero.py):
AlphaZero plane observations + the host pool, driven by a fake
pyspiel-API-shaped game (pyspiel is not in this image; the pool gates with
a descriptive error without it)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muax_tpu.envs.open_spiel_adapter import (AlphaZeroPlanes,
                                              OpenSpielVectorPool)


class FakeState:
  """1x3 capture-the-middle: two players alternate claiming cells; game
  ends when the board is full; player with more cells wins +1/-1."""

  def __init__(self, rng):
    self.board = np.zeros(3, np.int8)   # 0 empty, 1 p0, 2 p1
    self.player = 0
    self._rng = rng

  def current_player(self):
    return self.player

  def legal_actions(self):
    return [i for i in range(3) if self.board[i] == 0]

  def is_terminal(self):
    return not self.legal_actions()

  def is_chance_node(self):
    return False

  def apply_action(self, a):
    assert self.board[a] == 0
    self.board[a] = self.player + 1
    self.player = 1 - self.player

  def returns(self):
    if not self.is_terminal():
      return [0.0, 0.0]
    p0 = float(np.sum(self.board == 1))
    p1 = float(np.sum(self.board == 2))
    if p0 > p1:
      return [1.0, -1.0]
    if p1 > p0:
      return [-1.0, 1.0]
    return [0.0, 0.0]

  def observation_tensor(self, player):
    # Real pyspiel ravels in observation_tensor_shape order, which is
    # plane-major [P, H, W]: black, white, empty, current-player planes.
    t = np.zeros((4, 1, 3), np.float32)
    t[0, 0] = self.board == 1
    t[1, 0] = self.board == 2
    t[2, 0] = self.board == 0
    t[3] = float(self.player)
    return t.ravel()


class FakeGame:
  def __init__(self):
    self._rng = np.random.RandomState(0)

  def new_initial_state(self):
    return FakeState(self._rng)

  def observation_tensor_shape(self):
    return [4, 1, 3]

  def num_distinct_actions(self):
    return 3

  def max_game_length(self):
    return 3


def make_pool(num_envs=4, history=2):
  return OpenSpielVectorPool._from_game(FakeGame(), num_envs, seed=0,
                                        history_size=history, rows=1,
                                        cols=3)


def test_gate_without_pyspiel():
  try:
    import pyspiel  # noqa: F401
    pytest.skip("pyspiel installed")
  except ImportError:
    pass
  with pytest.raises(ImportError, match="open_spiel"):
    OpenSpielVectorPool("go", num_envs=1)


def test_planes_history_and_player():
  planes = AlphaZeroPlanes(1, 3, history_size=2)
  t0 = np.zeros((1, 3, 4), np.float32)
  t0[..., 3] = 0.0
  obs = planes.observe(t0)
  assert obs.shape == (1, 3, 5)          # 2*2 history + player
  assert obs[..., :4].sum() == 0         # empty board, zero history pad
  t1 = np.zeros((1, 3, 4), np.float32)
  t1[0, 1, 0] = 1.0                      # black stone appears
  t1[..., 3] = 1.0                       # player 1 to move
  obs = planes.observe(t1)
  assert obs[0, 1, 0] == 1.0             # newest black plane first
  assert obs[..., 2].sum() == 0          # previous step had no stones
  assert np.all(obs[..., -1] == 1.0)     # player plane

  t2 = np.zeros((1, 3, 4), np.float32)
  t2[0, 1, 0] = 1.0
  t2[0, 2, 1] = 1.0                      # white responds
  obs = planes.observe(t2)
  assert obs[0, 2, 1] == 1.0             # newest white
  assert obs[0, 1, 2] == 1.0             # previous black now at slot 1


def test_default_extract_plane_major_layout():
  """A flat pyspiel-style plane-major ravel must come back unscrambled
  (ADVICE r3: the reference example's channels-last reshape at
  run_alphazero.py:90 scrambles real pyspiel planes)."""
  rows, cols = 2, 3
  t = np.zeros((4, rows, cols), np.float32)
  t[0, 1, 2] = 1.0    # one black stone at (1, 2)
  t[1, 0, 1] = 1.0    # one white stone at (0, 1)
  t[3] = 1.0          # player 1 to move
  black, white, player = AlphaZeroPlanes._default_extract(
      t.ravel(), rows, cols)
  assert black[1, 2] == 1.0 and black.sum() == 1.0
  assert white[0, 1] == 1.0 and white.sum() == 1.0
  assert player == 1.0
  # Already-3-D plane-major input transposes too.
  black2, white2, _ = AlphaZeroPlanes._default_extract(t, rows, cols)
  np.testing.assert_array_equal(black2, black)
  np.testing.assert_array_equal(white2, white)


def test_pool_steps_and_mover_rewards():
  pool = make_pool(num_envs=2)
  carry = pool.reset(jax.random.PRNGKey(0), 2)
  assert carry.obs.shape == (2, 1, 3, 5)
  # Mask reflects the empty board.
  mask = np.asarray(pool.legal_action_mask(carry))
  np.testing.assert_array_equal(mask, np.ones((2, 3)))

  # p0 takes 0, p1 takes 1, p0 takes 2 -> p0 wins 2-1; the terminal step's
  # reward is from the MOVER's (p0) perspective: +1.
  for a, expect_done, expect_rew in [(0, False, 0.0), (1, False, 0.0),
                                     (2, True, 1.0)]:
    carry, rew, done, _ = pool.step(
        carry, jnp.full((2,), a, jnp.int32), jax.random.PRNGKey(1))
    assert bool(done[0]) == expect_done
    assert float(rew[0]) == pytest.approx(expect_rew)
  # Auto-reset happened: board empty again.
  mask = np.asarray(pool.legal_action_mask(carry))
  np.testing.assert_array_equal(mask, np.ones((2, 3)))


def test_pool_composes_with_rollout():
  from muax_tpu.config import MuZeroConfig, ReplayConfig, SearchConfig, \
      TrainConfig
  from muax_tpu.models import make_mlp_networks
  from muax_tpu.train.actor import make_rollout_fn

  pool = make_pool(num_envs=4)
  config = MuZeroConfig(
      search=SearchConfig(num_simulations=2),
      replay=ReplayConfig(capacity=16),
      train=TrainConfig(num_envs=4, collect_steps=6, batch_size=4,
                        unroll_steps=2, n_bootstrap=2, discount=-1.0))
  networks = make_mlp_networks(3, embedding_dim=4, support_size=5)
  rollout = jax.jit(make_rollout_fn(networks, pool, config))
  params = networks.init_params(jax.random.PRNGKey(0),
                                jnp.zeros((1, 1, 3, 5)))
  carry = pool.reset(jax.random.PRNGKey(1), 4)
  carry, segments, priorities, metrics = rollout(
      params, carry, jax.random.PRNGKey(2), 1.0)
  assert segments.obs.shape == (4, 6, 1, 3, 5)
  assert int(metrics["episodes_finished"]) > 0  # 3-move games finish fast


def test_ambiguous_square_plane_tensor_raises():
  """[P, H, W] with P == H == W cannot be disambiguated by shape; guessing
  scrambles planes silently (ADVICE r4) — the extractor must refuse."""
  import numpy as np
  import pytest

  from muax_tpu.envs.open_spiel_adapter import AlphaZeroPlanes

  with pytest.raises(ValueError, match="ambiguous"):
    AlphaZeroPlanes._default_extract(np.zeros((3, 3, 3), np.float32), 3, 3)
  # Flat tensors (pyspiel's native ravel) stay the supported spelling.
  flat = np.arange(27, dtype=np.float32)
  black, white, _ = AlphaZeroPlanes._default_extract(flat, 3, 3)
  assert black.shape == (3, 3) and float(black[0, 0]) == 0.0
  assert float(white[0, 0]) == 9.0  # plane-major: plane 1 starts at 9
