"""Host gymnasium environments under the jitted driver.

The escape hatch for environments that are not pure JAX (LunarLander,
Atari): a host-side pool of gymnasium envs is stepped through ONE batched
``jax.experimental.io_callback`` per rollout step from inside the compiled
program. The device program stays identical — search, replay, learner all
on-device — only the env transition crosses the host boundary (SURVEY §7
Phase 3 "host-env escape hatch").

``GymVectorPool`` implements the same interface as ``AutoResetWrapper``
(reset(rng, batch)/step(carry, action, rng)), with auto-reset handled
host-side, so ``make_rollout_fn`` and ``fit`` accept it unchanged.

Throughput note: each step costs one host round-trip over the whole batch;
prefer pure-JAX envs for the performance path.

Backend support: ``io_callback`` host callbacks are a standard JAX
feature on local CPU/GPU/TPU-VM backends (where all pool tests and
examples run). REMOTE-tunneled TPU backends that cannot proxy host
callbacks (e.g. this build image's relayed chip) hang the runtime on the
first callback — isolated empirically: a pure-XLA search + pool program
wedges the worker even with every custom kernel disabled. Run host-pool
workloads where the device and the gym processes share a host.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.experimental
import jax.numpy as jnp
import numpy as np

from muax_tpu.envs.base import AutoResetState, EnvSpec


def ensure_host_callback_backend(timeout: float = 180.0) -> bool:
  """Host-pool entry guard: pin this process to CPU when the selected
  backend cannot proxy host callbacks (``io_callback``), BEFORE the
  backend initializes.

  Some remote-tunneled PJRT plugins register under the platform name
  "tpu" but reject (or hang on) host send/recv callbacks — e.g.
  ``UNIMPLEMENTED: axon_pjrt does not support host send/recv callbacks``.
  The probe runs in a SUBPROCESS because probing in-process would itself
  initialize (and permanently pin) the unusable backend; jax cannot
  switch platforms after initialization.

  Returns True if the ambient backend supports host callbacks (nothing
  changed), False if the process was re-pinned to CPU. Call this before
  any jax device use; examples using host pools call it first thing.
  """
  import subprocess
  import sys
  import warnings

  # Already pinned to CPU (e.g. the test runners' pre-init config update):
  # CPU always supports host callbacks — skip the subprocess probe, which
  # would otherwise initialize the AMBIENT backend (possibly a tunneled
  # chip another process is using).
  try:
    if (getattr(jax.config, "jax_platform_name", None) == "cpu"
        or str(getattr(jax.config, "jax_platforms", "") or "")
        .startswith("cpu")):
      return True
  except Exception:
    pass
  code = (
      "import jax, jax.numpy as jnp, numpy as np, jax.experimental\n"
      "jax.jit(lambda: jax.experimental.io_callback("
      "lambda: np.float32(0), jax.ShapeDtypeStruct((), jnp.float32), "
      "ordered=False))()\n")
  try:
    ok = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                        capture_output=True).returncode == 0
  except Exception:
    ok = False
  if not ok:
    import jax
    jax.config.update("jax_platforms", "cpu")
    warnings.warn(
        "host callbacks are unsupported on the ambient jax backend; "
        "pinned this process to the CPU backend for the host-env pool",
        stacklevel=2)
  return ok


class GymVectorPool:
  """N host gym envs with host-side auto-reset, batched io_callback step."""

  def __init__(self, env_id: str, num_envs: int, seed: int = 0, **kwargs):
    import gymnasium

    if jax.default_backend() not in ("cpu", "gpu", "tpu"):
      # e.g. relayed/experimental PJRT plugins — see the module docstring's
      # backend-support note: io_callback can hang such runtimes.
      import warnings
      warnings.warn(
          f"host-pool io_callback on backend {jax.default_backend()!r}: "
          "remote-tunneled devices that cannot proxy host callbacks will "
          "hang on the first env step; run host-pool workloads on a "
          "CPU/GPU/TPU-VM backend", stacklevel=2)
    self.num_envs = num_envs
    self._envs = [gymnasium.make(env_id, **kwargs) for _ in range(num_envs)]
    self._seeds = list(range(seed, seed + num_envs))
    env0 = self._envs[0]
    self.spec = EnvSpec(
        observation_shape=tuple(env0.observation_space.shape),
        num_actions=int(env0.action_space.n),
        max_episode_steps=env0.spec.max_episode_steps or 1000)

  # -- host side -----------------------------------------------------------
  def _host_reset_all(self):
    obs = np.zeros((self.num_envs,) + self.spec.observation_shape,
                   np.float32)
    for i, env in enumerate(self._envs):
      o, _ = env.reset(seed=self._seeds[i])
      self._seeds[i] += self.num_envs
      obs[i] = o
    return obs

  def _host_step(self, action):
    action = np.asarray(action)
    obs = np.zeros((self.num_envs,) + self.spec.observation_shape,
                   np.float32)
    rew = np.zeros((self.num_envs,), np.float32)
    done = np.zeros((self.num_envs,), bool)
    for i, env in enumerate(self._envs):
      o, r, terminated, truncated, _ = env.step(int(action[i]))
      if terminated or truncated:
        done[i] = True
        o, _ = env.reset(seed=self._seeds[i])
        self._seeds[i] += self.num_envs
      obs[i] = o
      rew[i] = r
    return obs, rew, done

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
        env_state=(),  # lives host-side
        obs=obs,
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
        env_state=(),
        obs=obs,
        episode_step=jnp.where(done, 0, carry.episode_step + 1),
        episode_return=jnp.where(done, 0.0, episode_return))
    info = {"terminated": done, "truncated": jnp.zeros_like(done),
            "episode_return": episode_return}
    return new_carry, reward, done, info
