"""Real-ALE Atari path: the reference's acme Atari stack rebuilt over the
host-pool escape hatch.

The reference runs Atari through acme's GymAtariAdapter + AtariWrapper
(examples/rl_discrete/helpers.py:71-107): 84x84 grayscale, max-pool over the
last two raw frames, action repeat 4, 108k-step episode cap, terminal on
life loss, and actor-side frame stacking. Here the same preprocessing runs
host-side per pool worker (``AtariPreprocessing``), the pool batches N envs
behind one ``io_callback`` (``AtariVectorPool``), and frame stacking stays
device-side via ``envs.wrappers.FrameStacking`` — so the device program is
identical to every other pixel env.

ALE itself (`ale_py`) is an optional dependency; constructing the pool
without it raises with install instructions. ``AtariPreprocessing`` is
dependency-free and works on any gymnasium-style env producing RGB frames,
which is how the unit tests drive it.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from muax_tpu.envs.gym_adapter import GymVectorPool


class AtariPreprocessing:
  """Standard Atari preprocessing (Machado et al. 2018 / MuZero appendix),
  the host-side equivalent of acme's AtariWrapper chain
  (reference helpers.py:84-102):

    * action repeat ``frame_skip`` (default 4) with reward summation,
    * max-pool over the last two raw frames (flicker removal),
    * grayscale + bilinear resize to ``screen_size`` x ``screen_size``,
    * obs scaled to [0, 1] float32, shape [H, W, 1],
    * ``terminal_on_life_loss``: life loss ends the episode for the agent
      (env continues from current state on the next reset),
    * sticky actions with probability ``repeat_action_probability``,
    * ``max_episode_steps`` cap (reference: 108_000 raw frames).

  Works with any env whose ``step`` returns the gymnasium 5-tuple and whose
  observations are uint8/float RGB or grayscale frames.
  """

  def __init__(self, env, *, frame_skip: int = 4, screen_size: int = 84,
               terminal_on_life_loss: bool = True,
               repeat_action_probability: float = 0.0,
               max_episode_steps: int = 108_000, seed: Optional[int] = None):
    if frame_skip < 1:
      raise ValueError("frame_skip must be >= 1")
    self.env = env
    self.frame_skip = frame_skip
    self.screen_size = screen_size
    self.terminal_on_life_loss = terminal_on_life_loss
    self.repeat_action_probability = repeat_action_probability
    self.max_episode_steps = max_episode_steps
    self._rng = np.random.RandomState(seed)
    self._last_action = 0
    self._lives = 0
    self._steps = 0
    self._needs_real_reset = True
    shape = env.observation_space.shape
    self._pool_buf = np.zeros((2,) + tuple(shape[:2]), np.float32)

  # -- helpers --------------------------------------------------------------
  def _ale_lives(self) -> int:
    ale = getattr(getattr(self.env, "unwrapped", self.env), "ale", None)
    return int(ale.lives()) if ale is not None else 0

  def _to_gray(self, frame: np.ndarray) -> np.ndarray:
    frame = np.asarray(frame, np.float32)
    if frame.ndim == 3 and frame.shape[-1] == 3:
      # ITU-R 601 luma, what cv2.cvtColor(RGB2GRAY) computes.
      frame = (0.299 * frame[..., 0] + 0.587 * frame[..., 1]
               + 0.114 * frame[..., 2])
    elif frame.ndim == 3:
      frame = frame[..., 0]
    return frame

  def _resize(self, frame: np.ndarray) -> np.ndarray:
    s = self.screen_size
    if frame.shape == (s, s):
      return frame
    try:
      import cv2
      return cv2.resize(frame, (s, s), interpolation=cv2.INTER_AREA)
    except ImportError:
      # Nearest-neighbor fallback keeps the wrapper dependency-free.
      ys = (np.arange(s) * frame.shape[0] // s).clip(0, frame.shape[0] - 1)
      xs = (np.arange(s) * frame.shape[1] // s).clip(0, frame.shape[1] - 1)
      return frame[np.ix_(ys, xs)]

  def _observation(self) -> np.ndarray:
    pooled = self._pool_buf.max(axis=0)  # frames stored grayscale already
    obs = self._resize(pooled)
    return (obs / 255.0).astype(np.float32)[..., None]

  # -- gym-style API --------------------------------------------------------
  def reset(self, seed: Optional[int] = None):
    if self._needs_real_reset or not self.terminal_on_life_loss:
      kwargs = {} if seed is None else {"seed": seed}
      frame, info = self.env.reset(**kwargs)
      self._steps = 0
    else:
      # Life-loss pseudo-terminal: continue the underlying episode with a
      # no-op step (the acme AtariWrapper behavior).
      frame, _, terminated, truncated, info = self.env.step(0)
      if terminated or truncated:
        frame, info = self.env.reset()
        self._steps = 0
    self._needs_real_reset = False
    self._lives = self._ale_lives()
    self._last_action = 0
    gray = self._to_gray(frame)
    self._pool_buf[0] = gray
    self._pool_buf[1] = gray
    return self._observation(), info

  def step(self, action: int):
    if (self.repeat_action_probability > 0.0
        and self._rng.rand() < self.repeat_action_probability):
      action = self._last_action
    self._last_action = action

    total_reward = 0.0
    terminated = truncated = False
    info = {}
    frames_stepped = 0
    for t in range(self.frame_skip):
      frame, reward, terminated, truncated, info = self.env.step(action)
      frames_stepped += 1
      total_reward += float(reward)
      # Pool over the final two raw frames only (standard ALE pooling).
      if t >= self.frame_skip - 2:
        self._pool_buf[t - (self.frame_skip - 2)] = self._to_gray(frame)
      if terminated or truncated:
        break
    if frames_stepped < self.frame_skip or self.frame_skip == 1:
      # Early termination inside the skip loop (or no pooling window at
      # all): the pool buffer may still hold frames from the PREVIOUS
      # step — the terminal observation must be the last frame actually
      # seen, not a stale max-pool (ADVICE r3).
      self._pool_buf[0] = self._to_gray(frame)
      self._pool_buf[1] = self._pool_buf[0]

    self._steps += frames_stepped
    if self._steps >= self.max_episode_steps:
      truncated = True

    life_lost = False
    if self.terminal_on_life_loss:
      lives = self._ale_lives()
      life_lost = 0 < lives < self._lives
      self._lives = lives
    self._needs_real_reset = terminated or truncated
    done_for_agent = terminated or life_lost
    return (self._observation(), total_reward, done_for_agent, truncated,
            info)


class AtariVectorPool(GymVectorPool):
  """N preprocessed ALE envs behind one batched io_callback.

  Drop-in for ``fit``/``make_rollout_fn`` like every other pool; pair with
  ``envs.wrappers.FrameStacking`` on the device side for the reference's
  stacked-frame observations (helpers.py:99-104).
  """

  def __init__(self, game: str, num_envs: int, seed: int = 0,
               frame_skip: int = 4, screen_size: int = 84,
               terminal_on_life_loss: bool = True,
               repeat_action_probability: float = 0.0,
               max_episode_steps: int = 108_000):
    try:
      import ale_py  # noqa: F401
      import gymnasium
      gymnasium.register_envs(ale_py)
    except ImportError as e:
      raise ImportError(
          "AtariVectorPool needs ale_py (`pip install ale-py "
          "gymnasium[atari]`); the preprocessing stack itself "
          "(AtariPreprocessing) has no ALE dependency and is unit-tested "
          "against synthetic frames.") from e
    import gymnasium

    from muax_tpu.envs.base import EnvSpec

    self.num_envs = num_envs
    env_id = game if "/" in game or game.endswith("-v5") else f"ALE/{game}-v5"
    self._envs = [
        AtariPreprocessing(
            # frameskip=1 + disabled internal sticky actions: all
            # preprocessing lives in our wrapper, like acme's.
            gymnasium.make(env_id, frameskip=1,
                           repeat_action_probability=0.0),
            frame_skip=frame_skip, screen_size=screen_size,
            terminal_on_life_loss=terminal_on_life_loss,
            repeat_action_probability=repeat_action_probability,
            max_episode_steps=max_episode_steps, seed=seed + i)
        for i in range(num_envs)
    ]
    self._seeds = list(range(seed, seed + num_envs))
    n_act = int(self._envs[0].env.action_space.n)
    self.spec = EnvSpec(
        observation_shape=(screen_size, screen_size, 1),
        num_actions=n_act,
        max_episode_steps=max_episode_steps // frame_skip)

  def _host_step(self, action):
    # Same as GymVectorPool._host_step but honoring AtariPreprocessing's
    # (obs, reward, done, truncated, info) tuple with life-loss resets.
    action = np.asarray(action)
    obs = np.zeros((self.num_envs,) + self.spec.observation_shape,
                   np.float32)
    rew = np.zeros((self.num_envs,), np.float32)
    done = np.zeros((self.num_envs,), bool)
    for i, env in enumerate(self._envs):
      o, r, d, truncated, _ = env.step(int(action[i]))
      if d or truncated:
        done[i] = True
        o, _ = env.reset(seed=self._seeds[i])
        self._seeds[i] += self.num_envs
      obs[i] = o
      rew[i] = r
    return obs, rew, done
