"""Unit tests for the numerics kernels (SURVEY §4 test pyramid level 1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muax_tpu import ops


class TestSupport:

  def test_value_transform_roundtrip(self):
    x = jnp.array([-250.0, -3.7, -1.0, 0.0, 0.5, 1.0, 42.0, 300.0])
    y = ops.inv_value_transform(ops.value_transform(x))
    np.testing.assert_allclose(y, x, rtol=1e-4, atol=1e-4)

  def test_scalar_to_support_roundtrip(self):
    x = jnp.array([-5.0, -0.25, 0.0, 0.3, 1.0, 7.5])
    probs = ops.scalar_to_support(x, support_size=20)
    assert probs.shape == (6, 41)
    np.testing.assert_allclose(np.sum(probs, -1), 1.0, rtol=1e-6)
    back = ops.support_to_scalar(probs, support_size=20)
    np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-3)

  def test_scalar_to_support_is_two_hot(self):
    probs = ops.scalar_to_support(jnp.array([0.0]), support_size=5)
    # h(0)=0 lands exactly on the center bin.
    np.testing.assert_allclose(probs[0, 5], 1.0, atol=1e-6)
    assert np.count_nonzero(np.asarray(probs) > 1e-6) == 1

  def test_support_clips_out_of_range(self):
    probs = ops.scalar_to_support(jnp.array([1e9]), support_size=5)
    np.testing.assert_allclose(np.sum(probs, -1), 1.0, rtol=1e-6)
    assert np.argmax(probs[0]) == 10

  def test_two_hot_roundtrip(self):
    x = jnp.array([-150.0, -20.5, 0.0, 3.3, 149.9])
    probs = ops.scalar_to_two_hot(x, num_bins=51, vmin=-150.0, vmax=150.0)
    assert probs.shape == (5, 51)
    np.testing.assert_allclose(np.sum(probs, -1), 1.0, rtol=1e-6)
    back = ops.two_hot_to_scalar(probs, vmin=-150.0, vmax=150.0)
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-4)

  def test_batched_shapes(self):
    x = jnp.zeros((4, 7))
    assert ops.scalar_to_support(x, 10).shape == (4, 7, 21)
    assert ops.scalar_to_two_hot(x, 51, -150, 150).shape == (4, 7, 51)


def _naive_n_step(r, d, v, n):
  """O(T*n) reference implementation of n-step bootstrapped returns."""
  seq_len = len(r)
  out = np.zeros(seq_len)
  for t in range(seq_len):
    acc = 0.0
    disc = 1.0
    steps = 0
    for i in range(t, min(t + n, seq_len)):
      acc += disc * r[i]
      disc *= d[i]
      steps = i
      if d[i] == 0.0:
        break
    # bootstrap with the value at the cut position
    if disc > 0.0 and steps == min(t + n, seq_len) - 1:
      bootstrap_idx = min(t + n - 1, seq_len - 1)
      acc += disc * v[bootstrap_idx]
    out[t] = acc
  return out


class TestReturns:

  def test_matches_naive(self):
    rng = np.random.RandomState(0)
    T, n = 12, 4
    r = rng.randn(T)
    v = rng.randn(T)
    d = np.full(T, 0.9)
    d[7] = 0.0  # terminal mid-sequence
    got = ops.n_step_bootstrapped_returns(
        jnp.asarray(r), jnp.asarray(d), jnp.asarray(v), n)
    want = _naive_n_step(r, d, v, n)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

  def test_one_step_is_td_target(self):
    r = jnp.array([1.0, 2.0, 3.0])
    d = jnp.array([0.9, 0.9, 0.0])
    v = jnp.array([10.0, 20.0, 30.0])
    got = ops.n_step_bootstrapped_returns(r, d, v, n=1)
    want = r + d * v
    np.testing.assert_allclose(got, want, rtol=1e-6)

  def test_terminal_blocks_bootstrap(self):
    r = jnp.array([0.0, 1.0])
    d = jnp.array([0.0, 0.0])
    v = jnp.array([100.0, 100.0])
    got = ops.n_step_bootstrapped_returns(r, d, v, n=5)
    np.testing.assert_allclose(got, [0.0, 1.0], atol=1e-6)

  def test_batched(self):
    r = jnp.ones((3, 8))
    d = jnp.full((3, 8), 0.99)
    v = jnp.zeros((3, 8))
    out = ops.batched_n_step_returns(r, d, v, n=3)
    assert out.shape == (3, 8)


class TestGradients:

  def test_scale_gradient_forward_identity(self):
    x = jnp.array([1.0, -2.0])
    np.testing.assert_allclose(ops.scale_gradient(x, 0.5), x)

  def test_scale_gradient_backward(self):
    g = jax.grad(lambda x: jnp.sum(ops.scale_gradient(x, 0.5) ** 2))
    x = jnp.array([3.0])
    np.testing.assert_allclose(g(x), 0.5 * 2 * x, rtol=1e-6)

  def test_pytree_support(self):
    tree = {"a": jnp.ones(3), "b": jnp.zeros(2)}
    out = ops.scale_gradient(tree, 0.5)
    assert set(out.keys()) == {"a", "b"}


class TestNormalize:

  def test_min_max_range(self):
    x = jnp.array([[1.0, 5.0, 3.0]])
    y = ops.min_max_normalize(x)
    np.testing.assert_allclose(y, [[0.0, 1.0, 0.5]], rtol=1e-6)

  def test_constant_row_is_safe(self):
    y = ops.min_max_normalize(jnp.ones((2, 4)))
    assert np.all(np.isfinite(np.asarray(y)))

  def test_2d(self):
    x = jnp.arange(2 * 3 * 4 * 2, dtype=jnp.float32).reshape(2, 3, 4, 2)
    y = ops.min_max_normalize2d(x)
    assert y.shape == x.shape
    np.testing.assert_allclose(np.min(y, axis=(1, 2)), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.max(y, axis=(1, 2)), 1.0, atol=1e-6)


class TestFrames:

  def test_diff_matrix_small(self):
    m = np.asarray(ops.diff_transform_matrix(3))
    # Columns: last frame; 1st difference; 2nd difference.
    np.testing.assert_allclose(m[:, 0], [0, 0, 1])
    np.testing.assert_allclose(m[:, 1], [0, -1, 1])
    np.testing.assert_allclose(m[:, 2], [1, -2, 1])

  def test_diff_transform_constant_frames(self):
    x = jnp.ones((2, 2, 4))  # constant across frames -> diffs vanish
    y = ops.diff_transform(x)
    np.testing.assert_allclose(y[..., 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(y[..., 1:], 0.0, atol=1e-6)

  def test_action2plane(self):
    p = ops.action2plane(jnp.array([2, 3]), (4, 4), num_actions=4)
    assert p.shape == (2, 4, 4)
    np.testing.assert_allclose(p[0], 0.5)
    np.testing.assert_allclose(p[1], 0.75)


class TestAugmentations:
  """Dataset-side image augmentations (the stock transforms behind the
  observation_transform hook; DrQ/EfficientZero random shift+intensity)."""

  def test_random_shift_shapes_and_window_consistency(self):
    from muax_tpu.ops import random_shift
    obs = jax.random.uniform(jax.random.PRNGKey(0), (4, 3, 8, 8, 1))
    out = random_shift(jax.random.PRNGKey(1), obs, pad=2)
    assert out.shape == obs.shape
    # The same spatial shift applies to every frame of a window: shifting
    # a constant-in-time window keeps it constant in time.
    const = jnp.broadcast_to(obs[:, :1], obs.shape)
    out_c = random_shift(jax.random.PRNGKey(1), const, pad=2)
    np.testing.assert_allclose(np.asarray(out_c[:, 0]),
                               np.asarray(out_c[:, 1]))

  def test_random_shift_is_a_translation(self):
    from muax_tpu.ops import random_shift
    # A one-hot pixel stays a one-hot pixel (edge padding aside).
    obs = jnp.zeros((1, 1, 9, 9, 1)).at[0, 0, 4, 4, 0].set(1.0)
    out = random_shift(jax.random.PRNGKey(0), obs, pad=2)
    assert float(out.sum()) == pytest.approx(1.0)
    assert float(out.max()) == pytest.approx(1.0)

  def test_random_intensity_scales_whole_window(self):
    from muax_tpu.ops import random_intensity
    obs = jnp.ones((8, 2, 4, 4, 1))
    out = random_intensity(jax.random.PRNGKey(0), obs, scale=0.1)
    ratios = np.asarray(out).reshape(8, -1)
    # One factor per window, within the clipped range.
    for row in ratios:
      assert np.allclose(row, row[0])
      assert 0.8 <= row[0] <= 1.2

  def test_drq_transform_plugs_into_learner_hook(self):
    from muax_tpu.ops import drq_augmentation
    t = drq_augmentation(pad=1, intensity_scale=0.01)
    obs = jax.random.uniform(jax.random.PRNGKey(0), (4, 2, 6, 6, 1))
    out = jax.jit(t)(jax.random.PRNGKey(1), obs)
    assert out.shape == obs.shape
    # Named for stable config hashing across processes.
    from muax_tpu.config import MuZeroConfig, config_hash
    a, b = MuZeroConfig(), MuZeroConfig()
    a.train.observation_transform = drq_augmentation(pad=1)
    b.train.observation_transform = drq_augmentation(pad=1)
    assert config_hash(a) == config_hash(b)
