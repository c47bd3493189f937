"""Learner: loss sanity, gradient steps reduce loss, temperature handling,
optimizer factories."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from muax_tpu.config import MuZeroConfig, ReplayConfig, SearchConfig, TrainConfig
from muax_tpu.models import (
    create_optimizer,
    make_mlp_networks,
    muzero_loss,
    muzero_optimizer,
)
from muax_tpu.replay import replay_add, replay_init
from muax_tpu.train.learner import TrainState, make_update_fn
from muax_tpu.types import Transition


def make_batch(rng, B=16, L=5, obs_shape=(4,), num_actions=2):
  ks = jax.random.split(rng, 4)
  return Transition(
      obs=jax.random.normal(ks[0], (B, L) + obs_shape),
      action=jax.random.randint(ks[1], (B, L), 0, num_actions),
      reward=jax.random.uniform(ks[2], (B, L)),
      done=jnp.zeros((B, L), bool),
      rn=jax.random.uniform(ks[3], (B, L)) * 5,
      value=jnp.zeros((B, L)),
      pi=jnp.ones((B, L, num_actions)) / num_actions,
      weight=jnp.ones((B,)),
      mask=jnp.ones((B, L)),
  )


class TestLoss:

  def test_loss_finite_and_positive(self):
    networks = make_mlp_networks(2, embedding_dim=8, support_size=10)
    params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    batch = make_batch(jax.random.PRNGKey(1))
    loss, metrics = muzero_loss(params, batch, networks)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert metrics.priorities.shape == (16,)
    assert np.all(np.asarray(metrics.priorities) >= 0)

  def test_mask_zeroes_steps(self):
    networks = make_mlp_networks(2, embedding_dim=8, support_size=10)
    params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    batch = make_batch(jax.random.PRNGKey(1))
    # Garbage targets on masked steps must not change the loss.
    masked = batch.replace(mask=batch.mask.at[:, 2:].set(0.0))
    poisoned = masked.replace(rn=masked.rn.at[:, 2:].set(1e6))
    l1, _ = muzero_loss(params, masked, networks)
    l2, _ = muzero_loss(params, poisoned, networks)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)

  def test_gradient_descends(self):
    networks = make_mlp_networks(2, embedding_dim=8, support_size=10)
    params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    batch = make_batch(jax.random.PRNGKey(1))
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
      (loss, _), grads = jax.value_and_grad(
          lambda p: muzero_loss(p, batch, networks), has_aux=True)(params)
      updates, opt_state = opt.update(grads, opt_state, params)
      return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(60):
      params, opt_state, loss = step(params, opt_state)
      losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8


class TestUpdateFn:

  def _setup(self):
    config = MuZeroConfig(
        search=SearchConfig(num_simulations=4),
        replay=ReplayConfig(capacity=32, min_fill=4),
        train=TrainConfig(num_envs=4, collect_steps=8, batch_size=8,
                          unroll_steps=3, updates_per_iteration=2))
    networks = make_mlp_networks(2, embedding_dim=8, support_size=10)
    params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    # No warmup here: the canonical muzero_optimizer starts at lr=0, which
    # would make "params moved" assertions vacuous at step 1.
    opt = create_optimizer("adam", lr=1e-3)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.asarray(0, jnp.int32))
    replay = replay_init(32, 8, (4,), 2)
    batch = make_batch(jax.random.PRNGKey(1), B=8, L=8)
    replay = replay_add(replay, batch, jnp.ones((8, 8)))
    return config, networks, opt, state, replay

  def test_update_advances_and_preserves_temperature(self):
    config, networks, opt, state, replay = self._setup()
    state = state._replace(
        params=state.params._replace(temperature=jnp.asarray(0.37)))
    update = jax.jit(make_update_fn(networks, opt, config))
    new_state, new_replay, metrics = update(state, replay,
                                            jax.random.PRNGKey(2))
    assert int(new_state.step) == 1
    assert float(new_state.params.temperature) == pytest.approx(0.37)
    # Parameters actually moved.
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        state.params.representation,
                        new_state.params.representation)
    assert max(jax.tree.leaves(diff)) > 0
    assert np.isfinite(metrics["loss"])

  def test_priorities_refreshed(self):
    config, networks, opt, state, replay = self._setup()
    update = jax.jit(make_update_fn(networks, opt, config))
    _, new_replay, _ = update(state, replay, jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(new_replay.step_priorities),
                           np.asarray(replay.step_priorities))


class TestOptimizers:

  def test_muzero_optimizer_runs(self):
    opt = muzero_optimizer()
    params = {"w": jnp.ones(3)}
    state = opt.init(params)
    updates, state = opt.update({"w": jnp.ones(3)}, state, params)
    assert jnp.all(jnp.isfinite(updates["w"]))

  @pytest.mark.parametrize("name", ["adam", "adamw", "sgd", "rmsprop",
                                    "adagrad", "lion"])
  def test_factory_names(self, name):
    opt = create_optimizer(name, lr=1e-3)
    params = {"w": jnp.ones(3)}
    state = opt.init(params)
    updates, _ = opt.update({"w": jnp.ones(3)}, state, params)
    assert jnp.all(jnp.isfinite(updates["w"]))

  @pytest.mark.parametrize("sched", ["warmup_cosine_decay",
                                     "exponential_decay", "cosine_decay",
                                     "polynomial"])
  def test_factory_schedules(self, sched):
    opt = create_optimizer("adam", lr=1e-3, scheduler=sched)
    params = {"w": jnp.ones(3)}
    opt.update({"w": jnp.ones(3)}, opt.init(params), params)

  def test_unknown_raises(self):
    with pytest.raises(ValueError):
      create_optimizer("nope")


class TestCategoricalNetworks:
  """acme-style linear two-hot heads flow through loss and inference."""

  def test_loss_and_inference(self):
    import jax, jax.numpy as jnp, numpy as np
    from muax_tpu.models import make_categorical_mlp_networks
    from muax_tpu.models.losses import muzero_loss
    from muax_tpu.train.inference import make_root_fn, make_recurrent_fn
    networks = make_categorical_mlp_networks(
        2, embedding_dim=16, num_bins=51, vmin=-150, vmax=150,
        layer_sizes=(32,))
    params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    batch = make_batch(jax.random.PRNGKey(1), B=4, L=3)
    loss, metrics = muzero_loss(params, batch, networks)
    assert np.isfinite(float(loss))
    root = make_root_fn(networks)(params, jnp.zeros((2, 4)))
    assert np.all(np.abs(np.asarray(root.value)) <= 150.0)
    out, emb = make_recurrent_fn(networks, 0.99)(
        params, None, jnp.zeros(2, jnp.int32), root.embedding)
    assert np.all(np.abs(np.asarray(out.reward)) <= 150.0)

  def test_fc_resnet(self):
    import jax, jax.numpy as jnp, numpy as np
    from muax_tpu.models import make_fc_resnet_networks
    networks = make_fc_resnet_networks(4, embedding_dim=32, num_bins=11,
                                       vmin=0, vmax=10, num_blocks=2)
    params = networks.init_params(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 16)))
    from muax_tpu.train.inference import make_root_fn
    root = make_root_fn(networks)(params, jnp.zeros((2, 16)))
    assert root.prior_logits.shape == (2, 4)


class TestObservationTransform:
  """Dataset-side augmentation hook (reference observation_transform,
  acme/jax/muzero/config.py:69-71 + builder.py:194-199): applied to the
  sampled batch's obs in the learner only, never to stored obs."""

  def _setup(self):
    return TestUpdateFn._setup(TestUpdateFn())

  def test_transform_changes_loss_but_not_storage(self):
    config, networks, opt, state, replay = self._setup()
    update_plain = jax.jit(make_update_fn(networks, opt, config))
    _, _, m_plain = update_plain(state, replay, jax.random.PRNGKey(2))

    config.train.observation_transform = lambda rng, obs: jnp.zeros_like(obs)
    update_aug = jax.jit(make_update_fn(networks, opt, config))
    _, replay_after, m_aug = update_aug(state, replay, jax.random.PRNGKey(2))
    # Same rng, same sampled windows — only the obs fed to the loss differ.
    assert float(m_aug["loss"]) != pytest.approx(float(m_plain["loss"]))
    # Stored observations untouched: augmentation is dataset-side only.
    np.testing.assert_array_equal(np.asarray(replay_after.obs),
                                  np.asarray(replay.obs))

  def test_transform_receives_batch_shape(self):
    config, networks, opt, state, replay = self._setup()
    def check_shape(rng, obs):
      assert obs.shape == (config.train.batch_size,
                           config.train.unroll_steps, 4)
      return obs
    config.train.observation_transform = check_shape
    update = jax.jit(make_update_fn(networks, opt, config))
    _, _, metrics = update(state, replay, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


class TestFlattenOptimizer:
  """flatten_optimizer runs the chain over one raveled vector — identical
  numerics to the per-leaf chain, fewer ops inside the scanned learner."""

  def test_updates_bit_identical_to_tree_chain(self):
    from muax_tpu.models.optimizers import flatten_optimizer
    networks = make_mlp_networks(2, embedding_dim=8, support_size=10)
    params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    grads = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(1), x.shape), params)

    tree_opt = muzero_optimizer(flatten=False)
    flat_opt = muzero_optimizer(flatten=True)
    s_tree, s_flat = tree_opt.init(params), flat_opt.init(params)
    p_tree, p_flat = params, params
    for _ in range(3):
      u_t, s_tree = tree_opt.update(grads, s_tree, p_tree)
      u_f, s_flat = flat_opt.update(grads, s_flat, p_flat)
      p_tree = optax.apply_updates(p_tree, u_t)
      p_flat = optax.apply_updates(p_flat, u_f)
      for a, b in zip(jax.tree.leaves(u_t), jax.tree.leaves(u_f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestGroupedGating:
  """SPI gating composes with grouped presampling: num_allowed counts
  GLOBAL updates across groups, skipped updates advance nothing, and
  skipped chunks leave their sampled windows' priorities untouched."""

  def _setup(self):
    config, networks, opt, state, replay = TestUpdateFn._setup(
        TestUpdateFn())
    config.train.updates_per_iteration = 4
    config.train.presample_updates = 2   # -> 2 groups of 2
    return config, networks, opt, state, replay

  @pytest.mark.parametrize("allowed,expected", [(0, 0), (1, 1), (3, 3),
                                                (4, 4), (9, 4)])
  def test_num_allowed_counts_global_updates(self, allowed, expected):
    from muax_tpu.train.learner import make_multi_update_fn
    config, networks, opt, state, replay = self._setup()
    mu = jax.jit(make_multi_update_fn(networks, opt, config))
    new_state, _, metrics = mu(state, replay, jax.random.PRNGKey(0),
                               jnp.asarray(allowed, jnp.int32))
    assert int(new_state.step) == expected
    assert int(metrics["updates_done"]) == expected

  def test_fully_gated_leaves_priorities_untouched(self):
    from muax_tpu.train.learner import make_multi_update_fn
    config, networks, opt, state, replay = self._setup()
    mu = jax.jit(make_multi_update_fn(networks, opt, config))
    _, new_replay, _ = mu(state, replay, jax.random.PRNGKey(0),
                          jnp.asarray(0, jnp.int32))
    np.testing.assert_array_equal(np.asarray(new_replay.step_priorities),
                                  np.asarray(replay.step_priorities))


class TestGroupedInterleave:
  """Grouped presampling must hand every chunk its proportional
  online/offline mix (ADVICE r3: a row-major reshape gave the first chunks
  all-offline and the last all-online batches)."""

  def test_online_tail_spreads_across_chunks(self):
    from muax_tpu.train.learner import _interleave_chunks
    group, B, num_online = 8, 32, 128  # acme_defaults shape: offline 0.5
    # Mega-batch rows tagged: 0 = offline draw, 1 = online-queue draw
    # (replay_sample puts online rows LAST).
    tag = jnp.concatenate([jnp.zeros(group * B - num_online),
                           jnp.ones(num_online)])
    chunks = _interleave_chunks(tag, group, B)
    per_chunk_online = np.asarray(chunks.sum(axis=1))
    np.testing.assert_array_equal(per_chunk_online,
                                  np.full(group, num_online / group))

  def test_deinterleave_roundtrip(self):
    from muax_tpu.train.learner import (_deinterleave_flat,
                                        _interleave_chunks)
    group, B = 4, 6
    big = jnp.arange(group * B, dtype=jnp.float32)
    chunks = _interleave_chunks(big, group, B)
    np.testing.assert_array_equal(np.asarray(_deinterleave_flat(chunks, B)),
                                  np.asarray(big))

  def test_priorities_land_on_sampled_rows(self):
    """With interleaved chunks, the priority scatter must still hit the
    rows replay_sample returned — refresh every sampled window."""
    from muax_tpu.train.learner import make_multi_update_fn
    config, networks, opt, state, replay = TestUpdateFn._setup(
        TestUpdateFn())
    config.train.updates_per_iteration = 4
    config.train.presample_updates = 4
    config.replay.offline_fraction = 0.5
    config.replay.online_queue_size = 4
    mu = jax.jit(make_multi_update_fn(networks, opt, config))
    _, new_replay, metrics = mu(state, replay, jax.random.PRNGKey(0))
    assert int(metrics["updates_done"]) == 4
    assert not np.allclose(np.asarray(new_replay.step_priorities),
                           np.asarray(replay.step_priorities))


class TestResumeOptFormatGuard:
  """fit(resume_from=...) raises a readable error when the checkpoint's
  opt_state structure doesn't match the optimizer passed in (ADVICE r3:
  the flatten=True default change silently broke old checkpoints)."""

  def test_mismatched_opt_state_structure_raises(self, tmp_path):
    from muax_tpu.envs.cartpole import CartPole
    from muax_tpu.train.fit import fit
    config = MuZeroConfig(
        search=SearchConfig(num_simulations=2),
        replay=ReplayConfig(capacity=16, min_fill=2),
        train=TrainConfig(num_envs=2, collect_steps=8, batch_size=4,
                          unroll_steps=3, updates_per_iteration=1))
    networks = make_mlp_networks(2, embedding_dim=8, support_size=10)
    env = CartPole()
    _, results = fit(env, networks=networks, config=config,
                     optimizer=muzero_optimizer(flatten=True),
                     num_iterations=1, model_dir=str(tmp_path),
                     checkpoint_every=1, log_every=10,
                     log_fn=lambda *_: None)
    ckpt = str(tmp_path / "ckpt_latest.pkl")
    with pytest.raises(ValueError, match="opt_state with structure"):
      fit(env, networks=networks, config=config,
          optimizer=muzero_optimizer(flatten=False),
          num_iterations=2, model_dir=str(tmp_path), resume_from=ckpt,
          log_every=10, log_fn=lambda *_: None)


class TestMixedPrecisionLoss:
  """losses.muzero_loss(compute_dtype=bf16, remat=True): the conv-family
  bandwidth levers (scripts/conv_flops_analysis.py) must not change the
  gradient direction (AMP: f32 master grads, bf16 compute)."""

  def _setup(self):
    from muax_tpu.models import make_efficientzero_networks
    from muax_tpu.types import Transition
    nets = make_efficientzero_networks(num_actions=3, support_size=10,
                                       channels=8, num_blocks=1)
    B, L, OBS = 4, 3, (16, 16, 1)
    params = nets.init_params(jax.random.PRNGKey(0), jnp.zeros((1,) + OBS))
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    batch = Transition(
        obs=jax.random.uniform(ks[0], (B, L) + OBS),
        action=jax.random.randint(ks[1], (B, L), 0, 3),
        reward=jax.random.normal(ks[2], (B, L)) * 0.1,
        done=jnp.zeros((B, L), bool),
        rn=jax.random.normal(ks[2], (B, L)),
        value=jnp.zeros((B, L)),
        pi=jnp.full((B, L, 3), 1 / 3),
        mask=jnp.ones((B, L)),
        weight=jnp.ones((B,)))
    return nets, params, batch

  def test_bf16_remat_grads_match_f32(self):
    from muax_tpu.models.losses import muzero_loss
    nets, params, batch = self._setup()
    g0, m0 = jax.grad(lambda p: muzero_loss(p, batch, nets),
                      has_aux=True)(params)
    g1, m1 = jax.grad(
        lambda p: muzero_loss(p, batch, nets, compute_dtype=jnp.bfloat16,
                              remat=True), has_aux=True)(params)
    leaves0 = jax.tree.leaves((g0.representation, g0.prediction, g0.dynamic))
    leaves1 = jax.tree.leaves((g1.representation, g1.prediction, g1.dynamic))
    # Master grads stay f32 under AMP.
    assert all(x.dtype == jnp.float32 for x in leaves1)
    f0 = jnp.concatenate([x.ravel() for x in leaves0])
    f1 = jnp.concatenate([x.ravel() for x in leaves1])
    cos = jnp.vdot(f0, f1) / (
        jnp.linalg.norm(f0) * jnp.linalg.norm(f1) + 1e-12)
    assert float(cos) > 0.98, float(cos)
    # Loss value close in relative terms (bf16 has ~3 decimal digits).
    assert abs(float(m0.total) - float(m1.total)) < 0.05 * (
        abs(float(m0.total)) + 1e-6)

  def test_remat_alone_is_exact(self):
    from muax_tpu.models.losses import muzero_loss
    nets, params, batch = self._setup()
    g0, _ = jax.grad(lambda p: muzero_loss(p, batch, nets),
                     has_aux=True)(params)
    g2, _ = jax.grad(lambda p: muzero_loss(p, batch, nets, remat=True),
                     has_aux=True)(params)
    for a, b in zip(jax.tree.leaves(g0)[:-1], jax.tree.leaves(g2)[:-1]):
      assert jnp.allclose(a, b, atol=1e-5), (a - b)


class TestBatchedPrediction:
  """batched_prediction=True folds the K prediction applies into one
  [K*B] apply. The prediction tower never feeds the dynamics chain, so
  this must be EXACT (same graph modulo reshape)."""

  def test_grads_exact_vs_sequential(self):
    from muax_tpu.models import make_efficientzero_networks
    from muax_tpu.models.losses import muzero_loss
    from muax_tpu.types import Transition
    nets = make_efficientzero_networks(num_actions=3, support_size=10,
                                       channels=8, num_blocks=1)
    B, L, OBS = 4, 3, (16, 16, 1)
    params = nets.init_params(jax.random.PRNGKey(0), jnp.zeros((1,) + OBS))
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    batch = Transition(
        obs=jax.random.uniform(ks[0], (B, L) + OBS),
        action=jax.random.randint(ks[1], (B, L), 0, 3),
        reward=jax.random.normal(ks[2], (B, L)) * 0.1,
        done=jnp.zeros((B, L), bool),
        rn=jax.random.normal(ks[2], (B, L)),
        value=jnp.zeros((B, L)),
        pi=jnp.full((B, L, 3), 1 / 3),
        mask=jnp.ones((B, L)).at[2, 2].set(0.0),
        weight=jnp.ones((B,)))
    g_seq, m_seq = jax.grad(
        lambda p: muzero_loss(p, batch, nets, batched_prediction=False),
        has_aux=True)(params)
    g_bat, m_bat = jax.grad(
        lambda p: muzero_loss(p, batch, nets, batched_prediction=True),
        has_aux=True)(params)
    assert jnp.allclose(m_seq.total, m_bat.total, atol=1e-6)
    assert jnp.allclose(m_seq.priorities, m_bat.priorities, atol=1e-6)
    for a, b in zip(jax.tree.leaves(g_seq)[:-1], jax.tree.leaves(g_bat)[:-1]):
      assert jnp.allclose(a, b, atol=1e-5)


class TestUint8Replay:
  """uint8 pixel frames ride the replay ring as raw bytes (EnvSpec
  obs_dtype -> replay_init) and the networks up-cast on entry."""

  def test_fit_trains_on_uint8_pixel_catch(self):
    from muax_tpu.config import (MuZeroConfig, ReplayConfig, SearchConfig,
                                 TrainConfig)
    from muax_tpu.envs import PixelCatch
    from muax_tpu.models import make_efficientzero_networks, muzero_optimizer
    from muax_tpu.train.fit import fit
    env = PixelCatch(rows=5, columns=3, scale=4, dtype=jnp.uint8)
    assert env.spec.obs_dtype == jnp.uint8
    config = MuZeroConfig(
        search=SearchConfig(policy="muzero", num_simulations=4),
        replay=ReplayConfig(capacity=64, min_fill=4),
        train=TrainConfig(num_envs=4, collect_steps=6, batch_size=8,
                          updates_per_iteration=1, unroll_steps=3,
                          n_bootstrap=3))
    nets = make_efficientzero_networks(num_actions=3, support_size=5,
                                       channels=8, num_blocks=1)
    state, results = fit(env, nets, config, muzero_optimizer(),
                         num_iterations=2, seed=0, eval_every=100,
                         log_every=100, model_dir="/tmp/uint8_fit",
                         log_fn=lambda m: None)
    assert len(results["history"]) >= 0  # ran without dtype errors
