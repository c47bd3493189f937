"""sb3 adapter (reference muax/frameworks/sb3, SURVEY §2g): the rollout
buffer's vectorized n-step/lambda returns are checked against a naive
transcription of the reference's per-step loop (buffers.py:154-181), and
the sb3-dependent classes gate cleanly when sb3 is absent."""
import numpy as np
import pytest

from muax_tpu.adapters.sb3 import MuaxRolloutBuffer


def naive_rn(rewards, values, episode_starts, last_values, dones,
             n, lam, gamma):
  """Direct transcription of the reference recurrence
  (sb3/common/buffers.py:154-181)."""
  T, E = rewards.shape
  r = np.concatenate([rewards, np.zeros((n, E))])
  v = np.concatenate([values, np.tile(last_values, (n, 1))])
  starts = np.concatenate([episode_starts, np.tile(dones, (n, 1))])
  rn = np.zeros((T, E))
  for s in reversed(range(T)):
    G = (1.0 - starts[s + n]) * v[s + n]
    for t in reversed(range(s, s + n)):
      cont = 1.0 - starts[t + 1]
      G = r[t] + gamma * cont * (lam * G + (1 - lam) * v[t + 1])
    rn[s] = G
  return rn


def make_filled_buffer(T=16, E=3, seed=0, **kwargs):
  rng = np.random.default_rng(seed)
  buf = MuaxRolloutBuffer(buffer_size=T, obs_shape=(4,), pi_shape=(2,),
                          n_envs=E, seed=seed, **kwargs)
  for t in range(T):
    buf.add(obs=rng.normal(size=(E, 4)),
            action=rng.integers(0, 2, size=(E,)),
            reward=rng.normal(size=(E,)),
            value=rng.normal(size=(E,)),
            pi=rng.dirichlet(np.ones(2), size=E),
            episode_start=(rng.random(E) < 0.2).astype(np.float32)
            if t > 0 else np.ones(E, np.float32))
  return buf, rng


@pytest.mark.parametrize("lam,gamma,n", [(1.0, 0.99, 5), (0.9, 0.95, 3),
                                         (0.0, 0.9, 4)])
def test_rn_matches_reference_recurrence(lam, gamma, n):
  buf, rng = make_filled_buffer(n_step_bootstrapping=n, lambda_t=lam,
                                gamma_t=gamma)
  last_values = rng.normal(size=3)
  dones = (rng.random(3) < 0.5).astype(np.float32)
  buf.compute_Rn_and_weights(last_values, dones)
  expected = naive_rn(buf.rewards, buf.values, buf.episode_starts,
                      last_values, dones, n, lam, gamma)
  np.testing.assert_allclose(buf.Rn, expected, rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(
      buf.weights, np.abs(buf.values - buf.Rn) ** buf.prioritized_alpha,
      rtol=1e-5)


def test_windows_never_cross_episode_or_env_boundaries():
  T, E, k = 16, 3, 5
  buf, rng = make_filled_buffer(T=T, E=E, k_steps=k)
  buf.compute_Rn_and_weights(np.zeros(E), np.zeros(E))
  starts_flat = np.swapaxes(buf.episode_starts, 0, 1).reshape(-1)
  for batch in buf.get(batch_size=8):
    assert batch.observations.shape[1:] == (k, 4)
    # Recover flat indices by matching rewards (unique with high prob).
    rewards_flat = np.swapaxes(buf.rewards, 0, 1).reshape(-1)
    for row in batch.rewards:
      i0 = int(np.nonzero(np.isclose(rewards_flat, row[0]))[0][0])
      # consecutive in flat env-major index space
      np.testing.assert_allclose(rewards_flat[i0:i0 + k], row, rtol=1e-6)
      # same env throughout
      assert i0 // T == (i0 + k - 1) // T
      # no episode start strictly inside the window
      assert not starts_flat[i0 + 1:i0 + k].any()


def test_prioritized_sampling_prefers_high_weight_windows():
  T, E = 32, 1
  buf = MuaxRolloutBuffer(buffer_size=T, obs_shape=(1,), pi_shape=(2,),
                          n_envs=E, k_steps=4, prioritized_sampling=True,
                          prioritized_alpha=1.0, seed=1)
  for t in range(T):
    # obs encodes t so samples are identifiable
    buf.add(obs=np.full((E, 1), t, np.float32), action=np.zeros(E),
            reward=np.zeros(E), value=np.float32(t == 10) * 100.0,
            pi=np.ones((E, 2)) / 2,
            episode_start=np.ones(E) if t == 0 else np.zeros(E))
  buf.compute_Rn_and_weights(np.zeros(E), np.zeros(E))
  counts = 0
  total = 0
  for batch in buf.get(batch_size=64):
    counts += int(np.sum(batch.observations[:, 0, 0] == 10))
    total += len(batch.observations)
  assert counts / total > 0.5  # step 10 carries ~all the priority mass


def test_uniform_get_covers_all_feasible_windows():
  buf, _ = make_filled_buffer(T=12, E=2, k_steps=3)
  buf.compute_Rn_and_weights(np.zeros(2), np.zeros(2))
  seen = sum(len(b.observations) for b in buf.get(batch_size=5))
  feasible = len(buf._feasible_starts(3))
  assert seen == feasible > 0


def test_sb3_classes_gate_without_sb3():
  try:
    import stable_baselines3  # noqa: F401
    pytest.skip("sb3 installed; gate not exercisable")
  except ImportError:
    pass
  import muax_tpu.adapters.sb3 as sb3_adapter
  with pytest.raises(ImportError, match="stable-baselines3"):
    _ = sb3_adapter.MuaxPolicy
