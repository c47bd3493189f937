"""Numerics sanitizers (utils/debug.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muax_tpu.utils import (assert_finite, check_numerics, nan_guard,
                            set_check_numerics)


def test_assert_finite_passes_and_raises():
  assert_finite({"a": jnp.ones(3)}, "ok")
  with pytest.raises(FloatingPointError, match="bad"):
    assert_finite({"a": jnp.asarray([1.0, jnp.nan])}, "bad")


def test_check_numerics_disabled_is_identity():
  set_check_numerics(False)
  x = {"w": jnp.ones((2, 2))}
  out = check_numerics(x, "x")
  assert out is x  # literally a no-op


def test_check_numerics_enabled_reports(capfd):
  set_check_numerics(True)
  try:
    @jax.jit
    def f(x):
      return jnp.sum(check_numerics({"x": x}, "probe")["x"])

    f(jnp.asarray([1.0, jnp.inf]))
    jax.effects_barrier()
    captured = capfd.readouterr()
    assert "NON-FINITE" in captured.out and "probe" in captured.out
    # Finite input stays silent.
    f(jnp.asarray([1.0, 2.0]))
    jax.effects_barrier()
    assert "NON-FINITE" not in capfd.readouterr().out
  finally:
    set_check_numerics(False)


def test_nan_guard_raises_on_nan():
  @jax.jit
  def f(x):
    return jnp.log(x)

  with nan_guard():
    with pytest.raises(FloatingPointError):
      jax.block_until_ready(f(jnp.asarray(-1.0)))
  # Restored afterwards: NaN passes silently again.
  assert np.isnan(float(f(jnp.asarray(-1.0))))


def test_learner_grads_guard_fires_on_poisoned_batch(capfd):
  """The learner's grads pass through check_numerics: poisoned observations
  must produce the in-jit report when checks are enabled."""
  import optax
  from muax_tpu.config import MuZeroConfig, ReplayConfig, TrainConfig
  from muax_tpu.models import make_mlp_networks
  from muax_tpu.replay.buffer import replay_add, replay_init
  from muax_tpu.train.learner import TrainState, make_update_fn
  from muax_tpu.types import Transition

  set_check_numerics(True)
  try:
    networks = make_mlp_networks(2, embedding_dim=8, support_size=10)
    config = MuZeroConfig(
        replay=ReplayConfig(capacity=8, min_fill=1),
        train=TrainConfig(num_envs=4, collect_steps=6, batch_size=4,
                          unroll_steps=3, n_bootstrap=3))
    params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    opt = optax.adam(1e-3)
    ts = TrainState(params=params, opt_state=opt.init(params),
                    step=jnp.asarray(0, jnp.int32))
    B, L = 4, 6
    seg = Transition(
        obs=jnp.full((B, L, 4), jnp.nan),
        action=jnp.zeros((B, L), jnp.int32),
        reward=jnp.zeros((B, L)), done=jnp.zeros((B, L), bool),
        rn=jnp.zeros((B, L)), value=jnp.zeros((B, L)),
        pi=jnp.ones((B, L, 2)) / 2, weight=jnp.ones((B,)),
        mask=jnp.ones((B, L)))
    replay = replay_add(replay_init(8, L, (4,), 2), seg, jnp.ones((B, L)))
    update = jax.jit(make_update_fn(networks, opt, config))
    update(ts, replay, jax.random.PRNGKey(1))
    jax.effects_barrier()
    assert "NON-FINITE" in capfd.readouterr().out
  finally:
    set_check_numerics(False)
