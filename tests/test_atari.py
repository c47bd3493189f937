"""Atari preprocessing stack (VERDICT r2 missing #1): 84x84 grayscale,
two-frame max pooling, action repeat, life-loss pseudo-terminals, sticky
actions — unit-tested against a synthetic RGB env (no ALE dependency), the
same way acme's AtariWrapper semantics are defined independently of the
game (reference examples/rl_discrete/helpers.py:71-107)."""
import numpy as np
import pytest

from muax_tpu.envs.atari import AtariPreprocessing


class _Box:
  def __init__(self, shape):
    self.shape = shape


class _FakeALE:
  def __init__(self, owner):
    self._owner = owner

  def lives(self):
    return self._owner.lives


class FakeAtariEnv:
  """Gymnasium-5-tuple env emitting deterministic RGB frames: frame t has
  constant value t % 256 in channel 0 and stripes elsewhere."""

  def __init__(self, h=30, w=40, lives=3, terminate_at=1000):
    self.observation_space = _Box((h, w, 3))
    self.action_space = _Box(())
    self.action_space.n = 4
    self.h, self.w = h, w
    self.t = 0
    self.lives = lives
    self.start_lives = lives
    self.terminate_at = terminate_at
    self.ale = _FakeALE(self)
    self.unwrapped = self
    self.actions_taken = []

  def _frame(self):
    f = np.zeros((self.h, self.w, 3), np.uint8)
    f[..., 0] = self.t % 256
    return f

  def reset(self, seed=None):
    self.t = 0
    self.lives = self.start_lives
    return self._frame(), {}

  def step(self, action):
    self.actions_taken.append(int(action))
    self.t += 1
    terminated = self.t >= self.terminate_at
    return self._frame(), 1.0, terminated, False, {}


def test_obs_shape_dtype_and_scale():
  env = AtariPreprocessing(FakeAtariEnv(), frame_skip=4, screen_size=84)
  obs, _ = env.reset()
  assert obs.shape == (84, 84, 1)
  assert obs.dtype == np.float32
  assert 0.0 <= obs.min() and obs.max() <= 1.0


def test_action_repeat_and_reward_sum():
  fake = FakeAtariEnv()
  env = AtariPreprocessing(fake, frame_skip=4, terminal_on_life_loss=False)
  env.reset()
  _, reward, done, truncated, _ = env.step(2)
  assert reward == 4.0              # 4 raw steps, 1.0 each
  assert fake.actions_taken == [2, 2, 2, 2]
  assert not done and not truncated


def test_two_frame_max_pooling():
  """After a skip-4 step, the observation is the max of raw frames 3 and 4
  (values t=3 and t=4 in channel 0 -> pooled luma of t=4)."""
  fake = FakeAtariEnv()
  env = AtariPreprocessing(fake, frame_skip=4, screen_size=8,
                           terminal_on_life_loss=False)
  env.reset()
  obs, *_ = env.step(0)
  # channel-0-only frames: luma = 0.299 * t; pooled = max(3, 4) = 4.
  expected = 0.299 * 4 / 255.0
  np.testing.assert_allclose(obs.max(), expected, rtol=1e-5)


def test_life_loss_is_pseudo_terminal():
  fake = FakeAtariEnv(lives=3)
  env = AtariPreprocessing(fake, frame_skip=1, terminal_on_life_loss=True)
  env.reset()
  _, _, done, truncated, _ = env.step(0)
  assert not done
  fake.lives = 2                     # lose a life
  _, _, done, truncated, _ = env.step(0)
  assert done and not truncated
  # Reset after life loss continues the SAME underlying episode (no-op
  # step, not env.reset): the fake's step counter keeps advancing.
  t_before = fake.t
  env.reset()
  assert fake.t == t_before + 1      # one no-op step, no reset


def test_real_terminal_resets_underlying_env():
  fake = FakeAtariEnv(terminate_at=3)
  env = AtariPreprocessing(fake, frame_skip=1, terminal_on_life_loss=True)
  env.reset()
  done = truncated = False
  while not (done or truncated):
    _, _, done, truncated, _ = env.step(0)
  env.reset()
  assert fake.t == 0                 # true reset this time


def test_episode_step_cap_truncates():
  env = AtariPreprocessing(FakeAtariEnv(), frame_skip=4,
                           max_episode_steps=8,
                           terminal_on_life_loss=False)
  env.reset()
  _, _, done, truncated, _ = env.step(0)
  assert not truncated
  _, _, done, truncated, _ = env.step(0)
  assert truncated                   # 8 raw frames reached


def test_sticky_actions():
  fake = FakeAtariEnv()
  env = AtariPreprocessing(fake, frame_skip=1,
                           repeat_action_probability=1.0, seed=0,
                           terminal_on_life_loss=False)
  env.reset()
  env.step(3)                        # always sticky -> previous action (0)
  env.step(1)
  assert fake.actions_taken == [0, 0]
  # p=0: actions pass through untouched.
  fake2 = FakeAtariEnv()
  env2 = AtariPreprocessing(fake2, frame_skip=1,
                            repeat_action_probability=0.0,
                            terminal_on_life_loss=False)
  env2.reset()
  env2.step(3)
  env2.step(1)
  assert fake2.actions_taken == [3, 1]


def test_resize_without_cv2_fallback(monkeypatch):
  import builtins
  real_import = builtins.__import__

  def no_cv2(name, *a, **k):
    if name == "cv2":
      raise ImportError("blocked")
    return real_import(name, *a, **k)

  monkeypatch.setattr(builtins, "__import__", no_cv2)
  env = AtariPreprocessing(FakeAtariEnv(), frame_skip=2, screen_size=84)
  obs, _ = env.reset()
  assert obs.shape == (84, 84, 1)


def test_vector_pool_requires_ale():
  from muax_tpu.envs.atari import AtariVectorPool
  try:
    import ale_py  # noqa: F401
    pytest.skip("ale_py installed; gate not exercisable")
  except ImportError:
    pass
  with pytest.raises(ImportError, match="ale_py"):
    AtariVectorPool("Pong", num_envs=2)


def test_early_terminal_uses_last_frame_not_stale_pool():
  """Termination at t < frame_skip-1 must pool the LAST seen frame, not
  frames left over from the previous step (ADVICE r3). terminate_at=5:
  step 1 runs raw frames 1-4 (pool holds 3,4), step 2's first raw frame
  (t=5) terminates -> terminal obs must be luma(5), not max(3,4)."""
  fake = FakeAtariEnv(terminate_at=5)
  env = AtariPreprocessing(fake, frame_skip=4, screen_size=8,
                           terminal_on_life_loss=False)
  env.reset()
  env.step(0)
  obs, _, terminated, _, _ = env.step(0)
  assert terminated
  np.testing.assert_allclose(obs.max(), 0.299 * 5 / 255.0, rtol=1e-5)


def test_step_cap_counts_only_executed_frames():
  """An early break must advance the raw-frame counter by the frames
  actually stepped, so max_episode_steps counts real frames (ADVICE r3)."""
  fake = FakeAtariEnv(lives=3, terminate_at=1000)
  env = AtariPreprocessing(fake, frame_skip=4, terminal_on_life_loss=False,
                           max_episode_steps=8)
  env.reset()
  env.step(0)                         # 4 raw frames
  fake.terminate_at = 6               # next step terminates after 2 frames
  _, _, terminated, truncated, _ = env.step(0)
  assert terminated
  assert env._steps == 6              # 4 + 2 actually-executed frames
  assert not truncated                # 6 < 8: the cap did not fire
