"""Sharded SPMD program on the virtual 8-device CPU mesh (SURVEY §4 level 4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muax_tpu.config import MuZeroConfig, ReplayConfig, SearchConfig, TrainConfig
from muax_tpu.envs import AutoResetWrapper, CartPole
from muax_tpu.models import create_optimizer, make_mlp_networks
from muax_tpu.parallel import make_mesh, make_sharded_program, DATA_AXIS


@pytest.fixture(scope="module")
def mesh():
  assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
  return make_mesh()


def small_config(num_envs=16, batch_size=16):
  return MuZeroConfig(
      search=SearchConfig(num_simulations=4),
      replay=ReplayConfig(capacity=64, min_fill=8),
      train=TrainConfig(num_envs=num_envs, collect_steps=8,
                        batch_size=batch_size, updates_per_iteration=2,
                        unroll_steps=3, n_bootstrap=5))


class TestShardedProgram:

  def test_runs_and_replicates_params(self, mesh):
    config = small_config()
    networks = make_mlp_networks(2, embedding_dim=8, support_size=10)
    env = AutoResetWrapper(CartPole())
    program = make_sharded_program(
        networks, env, config, create_optimizer("adam", 1e-3), mesh)
    train_state, replay_state, env_carry = program.init(jax.random.PRNGKey(0))

    for i in range(3):
      train_state, replay_state, env_carry, metrics = program.iteration(
          train_state, replay_state, env_carry, jax.random.PRNGKey(i))
    assert int(train_state.step) == 3 * config.train.updates_per_iteration
    assert np.isfinite(float(metrics["loss"]))
    # Params stayed replicated and consistent across the mesh.
    leaf = jax.tree.leaves(train_state.params.representation)[0]
    assert leaf.sharding.is_fully_replicated

  def test_shards_fill_independently(self, mesh):
    config = small_config()
    networks = make_mlp_networks(2, embedding_dim=8, support_size=10)
    env = AutoResetWrapper(CartPole())
    program = make_sharded_program(
        networks, env, config, create_optimizer("adam", 1e-3), mesh)
    train_state, replay_state, env_carry = program.init(jax.random.PRNGKey(0))
    train_state, replay_state, env_carry, _ = program.iteration(
        train_state, replay_state, env_carry, jax.random.PRNGKey(1))
    # Every shard wrote num_envs/8 segments into its own ring.
    np.testing.assert_array_equal(
        np.asarray(replay_state.total_added),
        np.full(8, config.train.num_envs // 8))

  def test_matches_gradients_across_shards(self, mesh):
    """The psum'd update must keep parameters bit-identical on all shards:
    re-fetch per-device copies and compare."""
    config = small_config()
    networks = make_mlp_networks(2, embedding_dim=8, support_size=10)
    env = AutoResetWrapper(CartPole())
    program = make_sharded_program(
        networks, env, config, create_optimizer("adam", 1e-3), mesh)
    train_state, replay_state, env_carry = program.init(jax.random.PRNGKey(0))
    train_state, *_ = program.iteration(
        train_state, replay_state, env_carry, jax.random.PRNGKey(1))
    w = jax.tree.leaves(train_state.params.representation)[0]
    per_device = [np.asarray(s.data) for s in w.addressable_shards]
    for arr in per_device[1:]:
      np.testing.assert_array_equal(per_device[0], arr)

  def test_rejects_bad_divisibility(self, mesh):
    config = small_config(num_envs=10)
    networks = make_mlp_networks(2, embedding_dim=8, support_size=10)
    env = AutoResetWrapper(CartPole())
    with pytest.raises(ValueError):
      make_sharded_program(networks, env, config,
                           create_optimizer("adam", 1e-3), mesh)

  def test_reanalyze_on_the_mesh(self, mesh):
    """program.reanalyze refreshes every shard's own ring: targets change,
    freshness stamps advance, and the learner's target_staleness metric
    drops on the next iteration."""
    config = small_config()
    networks = make_mlp_networks(2, embedding_dim=8, support_size=10)
    env = AutoResetWrapper(CartPole())
    program = make_sharded_program(
        networks, env, config, create_optimizer("adam", 1e-3), mesh,
        reanalyze_segments=16)
    assert program.reanalyze is not None
    train_state, replay_state, env_carry = program.init(jax.random.PRNGKey(0))
    for i in range(4):
      train_state, replay_state, env_carry, metrics = program.iteration(
          train_state, replay_state, env_carry, jax.random.PRNGKey(i))
    stale_before = float(metrics["target_staleness"])
    pi_before = np.asarray(replay_state.pi)

    replay_state, re_metrics = program.reanalyze(
        train_state, replay_state, jax.random.PRNGKey(99))
    assert int(re_metrics["reanalyzed_segments"]) == 16
    assert np.isfinite(float(re_metrics["reanalyze_value_shift"]))
    # Shards refreshed independently: every shard has >= 1 fresh stamp.
    stamps = np.asarray(replay_state.target_step).reshape(8, -1)
    assert (stamps.max(axis=1) == int(train_state.step)).all()
    assert not np.array_equal(pi_before, np.asarray(replay_state.pi))

    train_state, replay_state, env_carry, metrics = program.iteration(
        train_state, replay_state, env_carry, jax.random.PRNGKey(5))
    assert float(metrics["target_staleness"]) < stale_before + 1.0

  def test_no_reanalyze_by_default(self, mesh):
    config = small_config()
    networks = make_mlp_networks(2, embedding_dim=8, support_size=10)
    env = AutoResetWrapper(CartPole())
    program = make_sharded_program(
        networks, env, config, create_optimizer("adam", 1e-3), mesh)
    assert program.reanalyze is None


class TestModelParallel:
  """Channel-sharded AZ resnet over a ('data', 'model') mesh — the tensor-
  parallel option the reference approximates with manual device_map
  (run_alphazero.py:136-181)."""

  def test_sharded_apply_matches_replicated(self):
    from muax_tpu.models.az_networks import make_az_resnet
    from muax_tpu.parallel import (make_mesh, make_model_parallel_apply,
                                   shard_az_params, sharded_fraction)
    from muax_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    mesh = make_mesh((2, 4), axis_names=(DATA_AXIS, MODEL_AXIS))
    network = make_az_resnet(7, channels=16, num_blocks=2)
    params = network.init_params(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 6, 7, 2)))
    obs = jax.random.normal(jax.random.PRNGKey(1), (8, 6, 7, 2))
    ref_logits, ref_value = network.apply(params, obs)

    sharded_net_params = shard_az_params(params.network, mesh)
    # Conv kernels really live channel-split: a [3,3,16,16] kernel has
    # [., ., ., 4] shards on the 4-way model axis.
    frac = sharded_fraction(params.network, mesh)
    assert frac > 0.5, frac
    some_conv = [x for x in jax.tree.leaves(sharded_net_params)
                 if x.ndim == 4][0]
    assert not some_conv.sharding.is_fully_replicated
    shard_shape = some_conv.sharding.shard_shape(some_conv.shape)
    assert shard_shape[-1] == some_conv.shape[-1] // 4

    apply = make_model_parallel_apply(network.network, mesh)
    logits, value = apply(sharded_net_params, obs)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(value), np.asarray(ref_value),
                               rtol=1e-4, atol=1e-5)


class TestGoScaleModelParallel:
  """The reference's actual tensor-parallel workload: AlphaZero Go — a
  19-block, 256-filter policy/value resnet on 19x19x17 observations
  (run_alphazero.py:129-273, manually device_map'd there). Verifies the
  channel-sharding rules cover >90% of the parameters at this scale and
  that the (data, model)-sharded apply compiles with GSPMD collectives and
  executes on the virtual mesh."""

  def test_go_resnet_sharding_coverage_and_apply(self):
    from muax_tpu.models.az_networks import make_az_resnet
    from muax_tpu.parallel import (make_mesh, make_model_parallel_apply,
                                   shard_az_params, sharded_fraction)
    from muax_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    mesh = make_mesh((2, 4), axis_names=(DATA_AXIS, MODEL_AXIS))
    network = make_az_resnet(19 * 19 + 1, channels=256, num_blocks=19)
    params = network.init_params(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 19, 19, 17)))

    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(params.network))
    assert n_params > 20e6, n_params          # really Go scale

    frac = sharded_fraction(params.network, mesh)
    assert frac > 0.9, frac                   # VERDICT r2 next #5

    sharded_params = shard_az_params(params.network, mesh)
    some_conv = [x for x in jax.tree.leaves(sharded_params)
                 if x.ndim == 4 and x.shape[-1] == 256][0]
    assert some_conv.sharding.shard_shape(some_conv.shape)[-1] == 64

    apply = make_model_parallel_apply(network.network, mesh)
    obs = jax.random.normal(jax.random.PRNGKey(1), (2, 19, 19, 17))
    # GSPMD must insert cross-device collectives for the channel shards.
    hlo = apply.lower(sharded_params, obs).compile().as_text()
    assert ("all-reduce" in hlo or "all-gather" in hlo
            or "reduce-scatter" in hlo), "no collectives in compiled HLO"
    logits, value = apply(sharded_params, obs)
    assert logits.shape == (2, 362) and value.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(logits))) and bool(
        jnp.all(jnp.isfinite(value)))


class TestFusedPathUnderShardMap:
  """The fused sampler + raw-kernel learner executing on the mesh
  (VERDICT r4 item 6: the shipped fast path had zero multi-device
  coverage). Replay content is made WINDOW-INVARIANT (every segment
  constant in time, uniform priorities) so the fused and XLA samplers —
  whose RNG streams legitimately differ — must produce byte-identical
  batches, and therefore matching updated parameters, per psum'd step."""

  def _uniform_replay(self, shard: int, capacity: int, L: int):
    from muax_tpu.replay.buffer import replay_add, replay_init
    from muax_tpu.types import Transition
    obs_val = 0.1 + 0.05 * shard
    K = capacity
    segs = Transition(
        obs=jnp.full((K, L, 4), obs_val),
        action=jnp.ones((K, L), jnp.int32),
        reward=jnp.full((K, L), 0.25),
        done=jnp.zeros((K, L), bool),
        rn=jnp.full((K, L), 0.5 + 0.1 * shard),
        value=jnp.zeros((K, L)),
        pi=jnp.full((K, L, 2), 0.5),
        weight=jnp.ones((K,)),
        mask=jnp.ones((K, L)))
    rs = replay_init(capacity, L, (4,), 2)
    return replay_add(rs, segs, jnp.ones((K, L)))

  def _run(self, mesh, fused: bool, monkeypatch):
    import optax

    import muax_tpu.train.learner as learner_mod
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P
    from muax_tpu.train.learner import TrainState, make_multi_update_fn
    monkeypatch.setattr(learner_mod, "_ALLOW_FUSED_SAMPLER_ON_CPU", True)

    L = 8
    config = MuZeroConfig(
        search=SearchConfig(num_simulations=4),
        replay=ReplayConfig(capacity=16, min_fill=4),
        train=TrainConfig(num_envs=8, collect_steps=L, batch_size=128,
                          updates_per_iteration=1, unroll_steps=3,
                          n_bootstrap=4, presample_updates=1,
                          fused_learner=fused, fused_sampler=fused))
    networks = make_mlp_networks(2, embedding_dim=8, support_size=10)
    params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    opt = optax.sgd(1e-2)
    ts = TrainState(params=params, opt_state=opt.init(params),
                    step=jnp.asarray(0, jnp.int32))
    mu = make_multi_update_fn(networks, opt, config, axis_name=DATA_AXIS)

    if fused:
      # The gate must report the fused path ACTIVE for this setup —
      # otherwise this test silently compares XLA against XLA.
      mode, lw, reason = mu.fused_group_status(
          ts, self._uniform_replay(0, 16, L))
      assert mode == "raw" and lw is not None, reason

    locals_ = [self._uniform_replay(i, 16, L) for i in range(8)]
    global_replay = jax.tree.map(
        lambda *xs: jnp.stack(xs).reshape((-1,) + xs[0].shape[1:])
        if xs[0].ndim else jnp.stack(xs), *locals_)
    global_replay = jax.device_put(
        global_replay, NamedSharding(mesh, P(DATA_AXIS)))

    def local_fn(ts, rs, rng):
      rs = rs.replace(cursor=rs.cursor[0], total_added=rs.total_added[0])
      rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
      ts2, rs2, _ = mu(ts, rs, rng)
      return ts2

    step = jax.jit(shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=P(),
        check_vma=False))
    return step(ts, global_replay, jax.random.PRNGKey(3))

  def test_fused_matches_xla_params(self, mesh, monkeypatch):
    ts_fused = self._run(mesh, True, monkeypatch)
    ts_xla = self._run(mesh, False, monkeypatch)
    leaves_f = jax.tree.leaves(ts_fused.params)
    leaves_x = jax.tree.leaves(ts_xla.params)
    for a, b in zip(leaves_f, leaves_x):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                 atol=3e-4, rtol=3e-4)
