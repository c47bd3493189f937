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
