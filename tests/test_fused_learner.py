"""Fused Pallas learner kernel: gradient parity with jax.grad over
models/losses.muzero_loss (interpret mode on the CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muax_tpu.models import make_mlp_networks
from muax_tpu.models.fused_learner import (extract_learner_weights,
                                           fused_muzero_grad)
from muax_tpu.models.losses import muzero_loss
from muax_tpu.types import Transition


def make_batch(rng, B=32, L=5, obs_shape=(4,), num_actions=2,
               with_masks=True):
  ks = jax.random.split(rng, 6)
  mask = jnp.ones((B, L))
  if with_masks:
    lengths = jax.random.randint(ks[4], (B,), 1, L + 1)
    mask = (jnp.arange(L)[None, :] < lengths[:, None]).astype(jnp.float32)
  return Transition(
      obs=jax.random.normal(ks[0], (B, L) + obs_shape),
      action=jax.random.randint(ks[1], (B, L), 0, num_actions),
      reward=jax.random.normal(ks[2], (B, L)),
      done=jnp.zeros((B, L), bool),
      rn=jax.random.normal(ks[3], (B, L)) * 5,
      value=jnp.zeros((B, L)),
      pi=jax.random.dirichlet(ks[5], jnp.ones(num_actions), (B, L)),
      weight=jax.random.uniform(ks[4], (B,)) + 0.5,
      mask=mask,
  )


NET_CONFIGS = [
    dict(num_actions=2, embedding_dim=8, support_size=10),
    dict(num_actions=4, embedding_dim=10, support_size=20,
         repr_layers=(12,), pred_layers=(16, 12), dyn_layers=(16, 12)),
    dict(num_actions=3, embedding_dim=6, support_size=5, repr_layers=()),
]


@pytest.mark.parametrize("cfg", NET_CONFIGS)
def test_grads_match_jax_grad(cfg):
  networks = make_mlp_networks(**cfg)
  obs_dim = 4
  params = networks.init_params(jax.random.PRNGKey(0),
                                jnp.zeros((1, obs_dim)))
  batch = make_batch(jax.random.PRNGKey(1), B=32, L=5,
                     num_actions=cfg["num_actions"])
  lw = extract_learner_weights(networks, params)
  assert lw is not None

  ref_grads, ref_metrics = jax.grad(
      lambda p: muzero_loss(p, batch, networks, l2_coef=1e-4,
                            gradient_scale=0.5, priority_alpha=0.5),
      has_aux=True)(params)
  grads, metrics = fused_muzero_grad(
      params, batch, networks, lw, l2_coef=1e-4, gradient_scale=0.5,
      priority_alpha=0.5, interpret=True)

  flat_ref = jax.tree_util.tree_flatten_with_path(ref_grads)[0]
  flat_new = jax.tree_util.tree_flatten_with_path(grads)[0]
  assert len(flat_ref) == len(flat_new)
  for (path_r, leaf_r), (path_n, leaf_n) in zip(flat_ref, flat_new):
    assert path_r == path_n
    np.testing.assert_allclose(
        np.asarray(leaf_n), np.asarray(leaf_r), rtol=2e-4, atol=1e-6,
        err_msg=str(path_r))

  np.testing.assert_allclose(float(metrics.total),
                             float(ref_metrics.total), rtol=1e-5)
  for name in ("reward_loss", "value_loss", "policy_loss", "l2_loss"):
    np.testing.assert_allclose(float(getattr(metrics, name)),
                               float(getattr(ref_metrics, name)),
                               rtol=1e-5, err_msg=name)
  np.testing.assert_allclose(np.asarray(metrics.priorities),
                             np.asarray(ref_metrics.priorities),
                             rtol=1e-4, atol=1e-6)


def test_padded_batch_lanes_contribute_nothing():
  """B not a multiple of the lane tile: padded lanes have coef 0 and the
  grads equal the unpadded jax.grad result."""
  networks = make_mlp_networks(2, embedding_dim=8, support_size=10)
  params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
  batch = make_batch(jax.random.PRNGKey(2), B=20, L=4)
  lw = extract_learner_weights(networks, params)
  ref_grads, _ = jax.grad(
      lambda p: muzero_loss(p, batch, networks), has_aux=True)(params)
  grads, _ = fused_muzero_grad(params, batch, networks, lw, interpret=True)
  for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(ref_grads)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                               atol=1e-6)


def test_extract_rejects_conv_family():
  from muax_tpu.models import make_efficientzero_networks
  networks = make_efficientzero_networks(3, support_size=5, channels=8,
                                         num_blocks=1)
  params = networks.init_params(jax.random.PRNGKey(0),
                                jnp.zeros((1, 16, 16, 1)))
  assert extract_learner_weights(networks, params) is None


class TestCategoricalFusedLearner:
  """The kernel on the acme categorical family (LayerNormMLP towers +
  linear two-hot heads) vs jax.grad — VERDICT r3 item #8. Covers the
  LayerNorm->tanh backward (dscale/doffset) and the linear decode."""

  def _setup(self, B=32):
    from muax_tpu.models.acme_networks import make_categorical_mlp_networks
    networks = make_categorical_mlp_networks(
        num_actions=3, embedding_dim=16, num_bins=21, vmin=-15.0,
        vmax=15.0, layer_sizes=(24, 24))
    params = networks.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    batch = make_batch(jax.random.PRNGKey(1), B=B, L=5, num_actions=3)
    return networks, params, batch

  def test_extract_parses_layernorm_towers(self):
    from muax_tpu.models.fused_learner import (
        extract_categorical_learner_spec)
    networks, params, _ = self._setup()
    spec = extract_categorical_learner_spec(networks, params)
    assert spec is not None
    assert spec.decode == "linear" and spec.num_bins == 21
    assert spec.repr_layers[0][0] == "ln_tanh"
    assert len(spec.repr_layers[0][1]) == 4          # w, b, scale, offset
    assert spec.pred_layers[1][0] == "elu"
    # fc-resnet (residual blocks) must be rejected -> jax.grad fallback.
    from muax_tpu.models.acme_networks import make_fc_resnet_networks
    fc = make_fc_resnet_networks(2, embedding_dim=16, num_bins=11,
                                 num_blocks=1)
    fc_params = fc.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    assert extract_categorical_learner_spec(fc, fc_params) is None

  def test_grads_match_jax_grad(self):
    from muax_tpu.models.fused_learner import (
        extract_categorical_learner_spec, fused_muzero_grad)
    networks, params, batch = self._setup()
    spec = extract_categorical_learner_spec(networks, params)
    ref_grads, ref_metrics = jax.grad(
        lambda p: muzero_loss(p, batch, networks, l2_coef=1e-4,
                              gradient_scale=0.5, priority_alpha=0.5),
        has_aux=True)(params)
    grads, metrics = fused_muzero_grad(
        params, batch, networks, spec, l2_coef=1e-4, gradient_scale=0.5,
        priority_alpha=0.5, interpret=True)

    flat_ref = jax.tree_util.tree_flatten_with_path(ref_grads)[0]
    flat_new = jax.tree_util.tree_flatten_with_path(grads)[0]
    assert len(flat_ref) == len(flat_new)
    for (path_r, leaf_r), (path_n, leaf_n) in zip(flat_ref, flat_new):
      assert path_r == path_n
      np.testing.assert_allclose(
          np.asarray(leaf_n), np.asarray(leaf_r), rtol=5e-4, atol=1e-6,
          err_msg=str(path_r))
    np.testing.assert_allclose(float(metrics.total),
                               float(ref_metrics.total), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(metrics.priorities),
                               np.asarray(ref_metrics.priorities),
                               rtol=1e-4, atol=1e-6)

  def test_raw_path_matches_batch_path(self):
    """Categorical family through the fused SAMPLER + raw kernel equals
    the prep-path kernel on the equivalent batch."""
    from muax_tpu.models.fused_learner import (
        extract_categorical_learner_spec, fused_muzero_grad,
        fused_muzero_grad_raw)
    from muax_tpu.replay.fused_sampler import (fused_sample_group,
                                               transpose_ring)
    from tests.test_fused_sampler import make_filled_replay
    networks, params, _ = self._setup()
    rs = make_filled_replay(jax.random.PRNGKey(1), C=32, L=8, A=3,
                            filled=24)
    W, K = 128, 5
    seg_idx = jax.random.randint(jax.random.PRNGKey(2), (W,), 0, 24)
    raw, lay = fused_sample_group(transpose_ring(rs), rs.step_priorities,
                                  rs.target_step, seg_idx,
                                  jax.random.PRNGKey(3), K, interpret=True)
    w_raw = raw[lay.weight]
    weight = w_raw / jnp.maximum(jnp.mean(w_raw), 1e-9)
    coef = weight / raw[lay.denom] / W
    spec = extract_categorical_learner_spec(networks, params)
    grads_raw, met_raw = fused_muzero_grad_raw(
        params, raw, coef, lay, networks, spec, interpret=True)

    starts = raw[lay.start].astype(jnp.int32)
    win = starts[:, None] + jnp.arange(K)[None, :]
    seg2 = seg_idx[:, None]
    batch = Transition(
        obs=rs.obs[seg2, win], action=rs.action[seg2, win],
        reward=rs.reward[seg2, win], done=rs.done[seg2, win],
        rn=rs.rn[seg2, win], value=rs.value[seg2, win],
        pi=rs.pi[seg2, win], weight=weight,
        mask=raw[lay.mask:lay.mask + K].T)
    grads_b, met_b = fused_muzero_grad(params, batch, networks, spec,
                                       interpret=True)
    # f32 association noise: the two paths build targets in different
    # places (outside vs in-kernel), so element-level sums differ ~1e-6.
    for a, b in zip(jax.tree.leaves(grads_raw), jax.tree.leaves(grads_b)):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                 atol=5e-6)
    np.testing.assert_allclose(float(met_raw.total), float(met_b.total),
                               rtol=1e-5)
