"""Fused MuZero learner: the k-step unrolled loss AND its backward pass as
ONE Pallas TPU kernel.

Why: at the reference's update density (samples_per_insert=32,
acme/jax/muzero/config.py:63-66) training is learner-bound. This kernel
runs the whole forward (representation -> L x {prediction, dynamics}) and
the hand-derived backward in VMEM as a single op: activations never touch
HBM, weight gradients accumulate across batch tiles in VMEM, and the L2
term folds into the gradient initialization — ~300 unrolled-loss HLOs
collapse into one.

Measured honestly (TPU v5e, batch 4096, L=5): 0.69 ms/grad vs 0.67 ms for
XLA's jax.grad — the two are at parity on this stack (XLA already fuses
the tiny-dense chain well; the grouped learner's remaining cost is the
replay gather + optimizer, not the gradient). The kernel is kept as the
default TPU path because it pins the op count (robust to XLA fusion
regressions at other batch/unroll shapes) and its gradients are
bit-compared against jax.grad in CI; `TrainConfig.fused_learner=False`
restores the jax.grad path (identical numerics, ~2x faster compile).

Scope: the flagship MLP family (models/networks.make_mlp_networks — elu
towers, integer-support two-hot heads, min-max normalized embeddings) with
the exact semantics of models/losses.muzero_loss (CE x3, scale_gradient
0.5 into dynamics, stop-gradient targets, /denom masking, weight-scaled
batch mean, L2 = l2_coef * 0.5 * sum p^2). Other families fall back to
jax.grad over muzero_loss; the dispatch lives in train/learner.py.

Gradient-parity is test-pinned against jax.grad (tests/test_fused_learner.py):
identical to ~1e-4 relative on random batches, including the min-max
normalization subgradient (tie-splitting argmin/argmax) and the elu
backward recovered from post-activations.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from muax_tpu.ops import scalar_to_support

_H_EPS = 1e-3     # value-transform epsilon (ops/support.py)
_MM_EPS = 1e-8    # min_max_normalize epsilon (ops/normalize.py)


class LearnerWeights(NamedTuple):
  """Named (module_name, W, b) triples per network, creation order."""
  repr_layers: tuple   # ((name, W, b), ...) hidden elu layers
  repr_out: tuple      # (name, W, b) final Linear(embedding) before minmax
  pred_layers: tuple
  pred_value: tuple    # (name, W [H, 2S+1], b)
  pred_policy: tuple   # (name, W [H, A], b)
  dyn_layers: tuple    # first W has in_dim = E + A
  dyn_reward: tuple
  dyn_state: tuple


def _named_linears(module_params):
  """hk.Linear params as [(module_name, W, b)] in creation order."""
  try:
    items = dict(module_params)
  except TypeError:
    return None
  out = []
  for key in items:
    if key == "linear":
      idx = 0
    elif key.startswith("linear_"):
      try:
        idx = int(key.split("_", 1)[1])
      except ValueError:
        return None
    else:
      return None
    layer = items[key]
    if "w" not in layer or "b" not in layer or layer["w"].ndim != 2:
      return None
    out.append((idx, key, layer["w"], layer["b"]))
  out.sort(key=lambda t: t[0])
  return [(k, w, b) for _, k, w, b in out]


def extract_learner_weights(networks, params) -> Optional[LearnerWeights]:
  """None unless ``params`` is the plain dense triplet with integer-support
  heads (then the caller falls back to jax.grad)."""
  if not hasattr(networks, "support_size"):
    return None
  num_actions = networks.num_actions
  full_support = 2 * networks.support_size + 1
  rep = _named_linears(params.representation)
  pred = _named_linears(params.prediction)
  dyn = _named_linears(params.dynamic)
  if not rep or not pred or not dyn or len(pred) < 3 or len(dyn) < 3:
    return None
  *r_hidden, r_out = rep
  *p_hidden, p_value, p_policy = pred
  *d_hidden, d_reward, d_state = dyn
  embedding_dim = r_out[1].shape[1]
  ok = (p_value[1].shape[1] == full_support
        and p_policy[1].shape[1] == num_actions
        and d_reward[1].shape[1] == full_support
        and d_state[1].shape[1] == embedding_dim
        and dyn[0][1].shape[0] == embedding_dim + num_actions
        and pred[0][1].shape[0] == embedding_dim)
  if not ok:
    return None
  return LearnerWeights(
      repr_layers=tuple(r_hidden), repr_out=r_out,
      pred_layers=tuple(p_hidden), pred_value=p_value, pred_policy=p_policy,
      dyn_layers=tuple(d_hidden), dyn_reward=d_reward, dyn_state=d_state)


def _weight_order(lw: LearnerWeights):
  """Flat (net, module_name, W, b) list in kernel ref order."""
  out = []
  for name, w, b in lw.repr_layers:
    out.append(("representation", name, w, b))
  out.append(("representation", lw.repr_out[0], lw.repr_out[1],
              lw.repr_out[2]))
  for name, w, b in lw.pred_layers:
    out.append(("prediction", name, w, b))
  out.append(("prediction", lw.pred_value[0], lw.pred_value[1],
              lw.pred_value[2]))
  out.append(("prediction", lw.pred_policy[0], lw.pred_policy[1],
              lw.pred_policy[2]))
  for name, w, b in lw.dyn_layers:
    out.append(("dynamic", name, w, b))
  out.append(("dynamic", lw.dyn_reward[0], lw.dyn_reward[1],
              lw.dyn_reward[2]))
  out.append(("dynamic", lw.dyn_state[0], lw.dyn_state[1], lw.dyn_state[2]))
  return out


def _elu(x):
  return jnp.where(x > 0, x, jnp.exp(x) - 1.0)


def _make_kernel(*, T: int, L: int, O: int, E: int, A: int, S41: int,
                 n_repr_hidden: int, n_pred_hidden: int, n_dyn_hidden: int,
                 gradient_scale: float, l2_coef: float, support_size: int,
                 raw_layout=None):
  """Kernel body. Transposed layout: features on sublanes, batch on the
  128-lane axis. All activations live as SSA values in VMEM for the whole
  forward+backward — nothing spills to HBM.

  Two input conventions share one body:
    * pre-built refs (obs, a_onehot, pi, value/reward two-hots, mask, coef)
      — the original per-batch entry (``fused_muzero_grad``), or
    * ``raw_layout`` set: ONE raw ref in the fused sampler's row layout
      (replay/fused_sampler.RawLayout) plus coef; action one-hots and the
      h-transform two-hot targets are built IN KERNEL from the raw scalar
      rows — this removes every per-update XLA prep op (one_hot,
      scalar_to_support, transposes), the dominant learner cost in the r4
      profile (scripts/profile_learner.py: ~1.1 ms/update of glue vs
      0.2 ms of gradient).
  """

  n_w = 2 * (n_repr_hidden + 1 + n_pred_hidden + 2 + n_dyn_hidden + 2)

  def matTx(w, x):
    """[in, out] x [in, T] -> [out, T]."""
    return jax.lax.dot_general(w, x, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

  def w_dx(w, dy):
    """[in, out] x [out, T] -> [in, T] (backward data grad)."""
    return jax.lax.dot_general(w, dy, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

  def dw_of(x, dy):
    """[in, T] x [out, T] -> dW [in, out] (contract batch lanes)."""
    return jax.lax.dot_general(x, dy, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)

  def minmax_fwd(x):
    mn = jnp.min(x, axis=0, keepdims=True)
    mx = jnp.max(x, axis=0, keepdims=True)
    d = jnp.maximum(mx - mn, _MM_EPS)
    return (x - mn) / d

  def minmax_bwd(x, dy):
    """Subgradient of min_max_normalize matching jax.grad: tie-splitting
    one-hots for argmin/argmax; no range-grad when the eps clamp binds."""
    mn = jnp.min(x, axis=0, keepdims=True)
    mx = jnp.max(x, axis=0, keepdims=True)
    rng_ = mx - mn
    d = jnp.maximum(rng_, _MM_EPS)
    y = (x - mn) / d
    is_mn = (x == mn).astype(jnp.float32)
    is_mx = (x == mx).astype(jnp.float32)
    m = is_mn / jnp.sum(is_mn, axis=0, keepdims=True)
    mm = is_mx / jnp.sum(is_mx, axis=0, keepdims=True)
    active = (rng_ > _MM_EPS).astype(jnp.float32)
    sg = jnp.sum(dy, axis=0, keepdims=True)
    sgy = jnp.sum(dy * y, axis=0, keepdims=True)
    return (dy - m * sg - active * sgy * (mm - m)) / d

  def log_softmax(z):
    zmax = jnp.max(z, axis=0, keepdims=True)
    s = z - zmax
    return s - jnp.log(jnp.sum(jnp.exp(s), axis=0, keepdims=True))

  def kernel(*refs):
    if raw_layout is None:
      (obs_ref, aoh_ref, pit_ref, vt_ref, rt_ref, mask_ref,
       coef_ref) = refs[:7]
      n_in = 7
      obs_v = obs_ref[:]
      aoh_v = aoh_ref[:]
      pit_v = pit_ref[:]
      vt_v = vt_ref[:]
      rt_v = rt_ref[:]
      mask_v = mask_ref[:]
    else:
      raw_ref, coef_ref = refs[:2]
      n_in = 2
      lay = raw_layout
      raw = raw_ref[:]
      obs_v = raw[lay.obs:lay.obs + O, :]

      a_bins = (jax.lax.broadcasted_iota(jnp.int32, (A, T), 0)
                .astype(jnp.float32))
      s_bins = (jax.lax.broadcasted_iota(jnp.int32, (S41, T), 0)
                .astype(jnp.float32) - float(support_size))

      def two_hot(x):
        """scalar_to_support (ops/support.py:37-56) on a [1, T] row."""
        y = jnp.sign(x) * (jnp.sqrt(jnp.abs(x) + 1.0) - 1.0) + _H_EPS * x
        y = jnp.clip(y, -float(support_size), float(support_size))
        low = jnp.floor(y)
        ph = y - low
        high = jnp.minimum(low + 1.0, float(support_size))
        return ((s_bins == low).astype(jnp.float32) * (1.0 - ph)
                + (s_bins == high).astype(jnp.float32) * ph)

      aoh_rows, vt_rows, rt_rows = [], [], []
      for i in range(L):
        act = raw[lay.action + i:lay.action + i + 1, :]
        aoh_rows.append((a_bins == act).astype(jnp.float32))
        vt_rows.append(two_hot(raw[lay.rn + i:lay.rn + i + 1, :]))
        rt_rows.append(two_hot(raw[lay.reward + i:lay.reward + i + 1, :]))
      aoh_v = jnp.concatenate(aoh_rows, axis=0)
      vt_v = jnp.concatenate(vt_rows, axis=0)
      rt_v = jnp.concatenate(rt_rows, axis=0)
      pit_v = raw[lay.pi:lay.pi + L * A, :]    # already step-major j*A + a
      mask_v = raw[lay.mask:lay.mask + L, :]

    wrefs = refs[n_in:n_in + n_w]
    dw_refs = refs[n_in + n_w:n_in + 2 * n_w]
    met_ref = refs[n_in + 2 * n_w]
    l2_ref = refs[n_in + 2 * n_w + 1]

    cursor = [0]

    def take():
      w = wrefs[cursor[0]][:]
      b = wrefs[cursor[0] + 1][:]
      cursor[0] += 2
      return w, b

    repr_hidden = [take() for _ in range(n_repr_hidden)]
    repr_out = take()
    pred_hidden = [take() for _ in range(n_pred_hidden)]
    pred_value = take()
    pred_policy = take()
    dyn_hidden = [take() for _ in range(n_dyn_hidden)]
    dyn_reward = take()
    dyn_state = take()

    coef = coef_ref[:]                      # [1, T] weight/(denom*B)

    # ------------------------------ forward ------------------------------
    x = obs_v
    repr_acts = [x]
    for w, b in repr_hidden:
      x = _elu(matTx(w, x) + b)
      repr_acts.append(x)
    s_pre0 = matTx(repr_out[0], x) + repr_out[1]
    s = minmax_fwd(s_pre0)

    # Per-step stashes for backward.
    steps = []
    v_sum = jnp.zeros((1, T), jnp.float32)
    p_sum = jnp.zeros((1, T), jnp.float32)
    r_sum = jnp.zeros((1, T), jnp.float32)
    v0 = None

    for i in range(L):
      mask = mask_v[i:i + 1, :]
      # prediction
      h = s
      pred_acts = [h]
      for w, b in pred_hidden:
        h = _elu(matTx(w, h) + b)
        pred_acts.append(h)
      v_logits = matTx(pred_value[0], h) + pred_value[1]
      p_logits = matTx(pred_policy[0], h) + pred_policy[1]
      v_ls = log_softmax(v_logits)
      p_ls = log_softmax(p_logits)
      vt = vt_v[i * S41:(i + 1) * S41, :]
      pit = pit_v[i * A:(i + 1) * A, :]
      v_sum += mask * (-jnp.sum(vt * v_ls, axis=0, keepdims=True))
      p_sum += mask * (-jnp.sum(pit * p_ls, axis=0, keepdims=True))
      if i == 0:
        probs0 = jnp.exp(v_ls)
        bins = (jax.lax.broadcasted_iota(jnp.int32, (S41, T), 0)
                .astype(jnp.float32) - float(support_size))
        ev = jnp.sum(probs0 * bins, axis=0, keepdims=True)
        eps = _H_EPS
        v0 = jnp.sign(ev) * (jnp.square(
            (jnp.sqrt(4.0 * eps * (jnp.abs(ev) + 1.0 + eps) + 1.0) - 1.0)
            / (2.0 * eps)) - 1.0)

      # dynamics (scale_gradient on s applies in backward only)
      a_oh = aoh_v[i * A:(i + 1) * A, :]
      g = None
      dyn_acts = []
      for j, (w, b) in enumerate(dyn_hidden):
        if j == 0:
          z = matTx(w[:E], s) + matTx(w[E:], a_oh) + b
        else:
          z = matTx(w, g) + b
        g = _elu(z)
        dyn_acts.append(g)
      r_logits = matTx(dyn_reward[0], g) + dyn_reward[1]
      r_ls = log_softmax(r_logits)
      rt = rt_v[i * S41:(i + 1) * S41, :]
      r_sum += mask * (-jnp.sum(rt * r_ls, axis=0, keepdims=True))
      s_pre = matTx(dyn_state[0], g) + dyn_state[1]
      s_next = minmax_fwd(s_pre)

      steps.append(dict(mask=mask, s=s, pred_acts=pred_acts,
                        v_ls=v_ls, p_ls=p_ls, vt=vt, pit=pit,
                        a_oh=a_oh, dyn_acts=dyn_acts, r_ls=r_ls, rt=rt,
                        s_pre=s_pre))
      s = s_next

    # ------------------------------ backward -----------------------------
    dW = {}  # ref index -> accumulated grad

    def acc(idx, val):
      dW[idx] = dW[idx] + val if idx in dW else val

    def layer_slot(base, j):
      return base + 2 * j

    # ref-index bases mirror the take() order above.
    b_repr = 0
    b_repr_out = 2 * n_repr_hidden
    b_pred = b_repr_out + 2
    b_pred_value = b_pred + 2 * n_pred_hidden
    b_pred_policy = b_pred_value + 2
    b_dyn = b_pred_policy + 2
    b_dyn_reward = b_dyn + 2 * n_dyn_hidden
    b_dyn_state = b_dyn_reward + 2

    def back_elu_from_act(a):
      """elu'(z) recovered from the post-activation a = elu(z)."""
      return jnp.where(a > 0, 1.0, a + 1.0)

    ds_next = jnp.zeros((E, T), jnp.float32)
    for i in reversed(range(L)):
      st = steps[i]
      cmask = coef * st["mask"]                                # [1, T]
      # dynamics branch
      ds_pre = minmax_bwd(st["s_pre"], ds_next)
      dr = cmask * (jnp.exp(st["r_ls"]) - st["rt"])            # [S41, T]
      g_last = st["dyn_acts"][-1]
      acc(b_dyn_reward, dw_of(g_last, dr))
      acc(b_dyn_reward + 1, jnp.sum(dr, axis=1, keepdims=True))
      acc(b_dyn_state, dw_of(g_last, ds_pre))
      acc(b_dyn_state + 1, jnp.sum(ds_pre, axis=1, keepdims=True))
      dg = w_dx(dyn_reward[0], dr) + w_dx(dyn_state[0], ds_pre)
      for j in reversed(range(n_dyn_hidden)):
        dz = dg * back_elu_from_act(st["dyn_acts"][j])
        w, _ = dyn_hidden[j]
        if j == 0:
          acc(layer_slot(b_dyn, j) + 1, jnp.sum(dz, axis=1, keepdims=True))
          # split input grad: rows [:E] -> state, [E:] -> one-hot action
          dsa = w_dx(w, dz)                                    # [E+A, T]
          acc(layer_slot(b_dyn, j),
              jnp.concatenate([dw_of(st["s"], dz), dw_of(st["a_oh"], dz)],
                              axis=0))
          ds_dyn = dsa[:E]
        else:
          prev = st["dyn_acts"][j - 1]
          acc(layer_slot(b_dyn, j), dw_of(prev, dz))
          acc(layer_slot(b_dyn, j) + 1, jnp.sum(dz, axis=1, keepdims=True))
          dg = w_dx(w, dz)
      if n_dyn_hidden == 0:
        ds_dyn = dg[:E]  # pragma: no cover (family always has >=1 hidden)

      # prediction branch
      dv = cmask * (jnp.exp(st["v_ls"]) - st["vt"])
      dp = cmask * (jnp.exp(st["p_ls"]) - st["pit"])
      h_last = st["pred_acts"][-1]
      acc(b_pred_value, dw_of(h_last, dv))
      acc(b_pred_value + 1, jnp.sum(dv, axis=1, keepdims=True))
      acc(b_pred_policy, dw_of(h_last, dp))
      acc(b_pred_policy + 1, jnp.sum(dp, axis=1, keepdims=True))
      dh = w_dx(pred_value[0], dv) + w_dx(pred_policy[0], dp)
      for j in reversed(range(n_pred_hidden)):
        dz = dh * back_elu_from_act(st["pred_acts"][j + 1])
        w, _ = pred_hidden[j]
        acc(layer_slot(b_pred, j), dw_of(st["pred_acts"][j], dz))
        acc(layer_slot(b_pred, j) + 1, jnp.sum(dz, axis=1, keepdims=True))
        dh = w_dx(w, dz)

      # total grad into s_i: prediction + gradient_scale * dynamics
      # (models/losses.py: s is scale_gradient'd AFTER prediction consumed
      # it, so only the dynamics contribution is scaled).
      ds_next = dh + gradient_scale * ds_dyn

    # representation backward
    ds_pre0 = minmax_bwd(s_pre0, ds_next)
    x_last = repr_acts[-1]
    acc(b_repr_out, dw_of(x_last, ds_pre0))
    acc(b_repr_out + 1, jnp.sum(ds_pre0, axis=1, keepdims=True))
    dx = w_dx(repr_out[0], ds_pre0)
    for j in reversed(range(n_repr_hidden)):
      dz = dx * back_elu_from_act(repr_acts[j + 1])
      w, _ = repr_hidden[j]
      acc(layer_slot(b_repr, j), dw_of(repr_acts[j], dz))
      acc(layer_slot(b_repr, j) + 1, jnp.sum(dz, axis=1, keepdims=True))
      dx = w_dx(w, dz)

    # ------------------------- outputs / accumulation --------------------
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
      # L2 folds into the gradient at init: d(l2*0.5*sum p^2)/dp = l2*p.
      l2 = jnp.zeros((1, 1), jnp.float32)
      for k in range(n_w):
        wv = wrefs[k][:]
        dw_refs[k][:] = l2_coef * wv + dW[k]
        l2 = l2 + jnp.sum(jnp.square(wv))
      l2_ref[:] = jnp.broadcast_to(0.5 * l2_coef * l2, l2_ref.shape)

    @pl.when(jnp.logical_not(first))
    def _accum():
      for k in range(n_w):
        dw_refs[k][:] = dw_refs[k][:] + dW[k]

    met_ref[:] = jnp.concatenate(
        [v_sum, p_sum, r_sum, v0,
         jnp.zeros((4, T), jnp.float32)], axis=0)

  return kernel


def _round_up(x: int, m: int) -> int:
  return ((x + m - 1) // m) * m


def fused_muzero_grad(
    params,
    batch,
    networks,
    lw: LearnerWeights,
    *,
    l2_coef: float = 1e-4,
    gradient_scale: float = 0.5,
    priority_alpha: float = 0.5,
    num_unroll_steps: Optional[int] = None,
    batch_tile: int = 512,
    interpret: Optional[bool] = None,
):
  """(grads: MZParams-pytree, metrics: LossMetrics-dict) with the exact
  semantics of jax.grad(muzero_loss, has_aux=True) for the MLP family."""
  from muax_tpu.models.losses import LossMetrics

  if interpret is None:
    interpret = jax.default_backend() == "cpu"
  B = batch.action.shape[0]
  L = num_unroll_steps or batch.action.shape[1]
  A = networks.num_actions
  S = networks.support_size
  S41 = 2 * S + 1
  E = lw.repr_out[1].shape[1]
  obs0 = batch.obs[:, 0].reshape(B, -1).astype(jnp.float32)
  O = obs0.shape[1]

  a_oh = jax.nn.one_hot(batch.action[:, :L], A, dtype=jnp.float32)
  vt = scalar_to_support(batch.rn[:, :L], S)
  rt = scalar_to_support(batch.reward[:, :L], S)
  mask = batch.mask[:, :L].astype(jnp.float32)
  denom = jnp.maximum(jnp.sum(batch.mask, axis=1), 1.0)
  coef = (batch.weight / denom / B).astype(jnp.float32)

  def to_rows(x, rows_per_step):
    # [B, L, F] -> [L*F, B] step-major rows.
    return jnp.transpose(x, (1, 2, 0)).reshape(rows_per_step * L, B)

  T = min(batch_tile, _round_up(B, 128))
  G = -(-B // T)
  BP = G * T
  inputs = [obs0.T, to_rows(a_oh, A), to_rows(batch.pi[:, :L], A),
            to_rows(vt, S41), to_rows(rt, S41), mask.T, coef[None, :]]
  if BP != B:
    # Padded lanes: coef rows are zero so they contribute nothing to any
    # gradient or metric.
    inputs = [jnp.pad(x, ((0, 0), (0, BP - B))) for x in inputs]

  order = _weight_order(lw)
  wlist = []
  for _, _, w, b in order:
    wlist.append(jnp.asarray(w, jnp.float32))
    wlist.append(jnp.reshape(jnp.asarray(b, jnp.float32), (-1, 1)))
  n_w = len(wlist)

  kernel = _make_kernel(
      T=T, L=L, O=O, E=E, A=A, S41=S41,
      n_repr_hidden=len(lw.repr_layers),
      n_pred_hidden=len(lw.pred_layers),
      n_dyn_hidden=len(lw.dyn_layers),
      gradient_scale=gradient_scale, l2_coef=l2_coef, support_size=S)

  def col_spec(rows):
    return pl.BlockSpec((rows, T), lambda i: (0, i),
                        memory_space=pltpu.VMEM)

  def const_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)

  in_specs = ([col_spec(O), col_spec(L * A), col_spec(L * A),
               col_spec(L * S41), col_spec(L * S41), col_spec(L),
               col_spec(1)]
              + [const_spec(w.shape) for w in wlist])
  out_specs = ([const_spec(w.shape) for w in wlist]
               + [col_spec(8), const_spec((1, 1))])
  out_shape = ([jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wlist]
               + [jax.ShapeDtypeStruct((8, BP), jnp.float32),
                  jax.ShapeDtypeStruct((1, 1), jnp.float32)])

  outs = pl.pallas_call(
      kernel,
      grid=(G,),
      in_specs=in_specs,
      out_specs=tuple(out_specs),
      out_shape=tuple(out_shape),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(*inputs, *wlist)

  dw_list, met, l2 = outs[:n_w], outs[n_w], outs[n_w + 1]

  # Re-pack flat grads into the MZParams pytree (pure restructuring — no
  # device ops).
  grads = {"representation": {}, "prediction": {}, "dynamic": {}}
  for k, (net, name, w, _) in enumerate(order):
    grads[net][name] = {"w": dw_list[2 * k],
                        "b": dw_list[2 * k + 1].reshape(-1)}
  grads = type(params)(
      representation=grads["representation"],
      prediction=grads["prediction"],
      dynamic=grads["dynamic"],
      temperature=jnp.zeros_like(params.temperature))

  v_sum = met[0, :B]
  p_sum = met[1, :B]
  r_sum = met[2, :B]
  v0 = met[3, :B]
  l2 = l2[0, 0]
  per_example = (r_sum + v_sum + p_sum) / denom
  total = jnp.sum(coef * per_example * denom) + l2  # = mean(w*per_ex) + l2
  priorities = jnp.abs(v0 - batch.rn[:, 0]) ** priority_alpha
  metrics = LossMetrics(
      total=total,
      reward_loss=jnp.mean(r_sum / denom),
      value_loss=jnp.mean(v_sum / denom),
      policy_loss=jnp.mean(p_sum / denom),
      l2_loss=l2,
      priorities=jax.lax.stop_gradient(priorities),
  )
  return grads, metrics


def fused_muzero_grad_raw(
    params,
    raw: jax.Array,               # [R, B] fused-sampler rows (RawLayout)
    coef: jax.Array,              # [B] = weight / denom / B
    raw_layout,
    networks,
    lw: LearnerWeights,
    *,
    l2_coef: float = 1e-4,
    gradient_scale: float = 0.5,
    priority_alpha: float = 0.5,
    num_unroll_steps: Optional[int] = None,
    batch_tile: int = 512,
    interpret: Optional[bool] = None,
):
  """``fused_muzero_grad`` fed straight from the fused sampler's raw rows:
  no per-update XLA prep (one_hot / scalar_to_support / transposes) — the
  kernel builds targets in VMEM (see _make_kernel's raw_layout mode).
  Semantics identical to fused_muzero_grad on the equivalent Transition
  batch (test-pinned, tests/test_fused_learner.py)."""
  from muax_tpu.models.losses import LossMetrics

  if interpret is None:
    interpret = jax.default_backend() == "cpu"
  lay = raw_layout
  B = raw.shape[1]
  L = num_unroll_steps or lay.K
  A = networks.num_actions
  S = networks.support_size
  S41 = 2 * S + 1
  E = lw.repr_out[1].shape[1]
  O = lay.O

  T = min(batch_tile, _round_up(B, 128))
  G = -(-B // T)
  BP = G * T
  coef_in = coef.astype(jnp.float32)[None, :]
  if BP != B:
    raw = jnp.pad(raw, ((0, 0), (0, BP - B)))
    coef_in = jnp.pad(coef_in, ((0, 0), (0, BP - B)))

  order = _weight_order(lw)
  wlist = []
  for _, _, w, b in order:
    wlist.append(jnp.asarray(w, jnp.float32))
    wlist.append(jnp.reshape(jnp.asarray(b, jnp.float32), (-1, 1)))
  n_w = len(wlist)

  kernel = _make_kernel(
      T=T, L=L, O=O, E=E, A=A, S41=S41,
      n_repr_hidden=len(lw.repr_layers),
      n_pred_hidden=len(lw.pred_layers),
      n_dyn_hidden=len(lw.dyn_layers),
      gradient_scale=gradient_scale, l2_coef=l2_coef, support_size=S,
      raw_layout=lay)

  def col_spec(rows):
    return pl.BlockSpec((rows, T), lambda i: (0, i),
                        memory_space=pltpu.VMEM)

  def const_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)

  in_specs = ([col_spec(lay.rows), col_spec(1)]
              + [const_spec(w.shape) for w in wlist])
  out_specs = ([const_spec(w.shape) for w in wlist]
               + [col_spec(8), const_spec((1, 1))])
  out_shape = ([jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wlist]
               + [jax.ShapeDtypeStruct((8, BP), jnp.float32),
                  jax.ShapeDtypeStruct((1, 1), jnp.float32)])

  outs = pl.pallas_call(
      kernel,
      grid=(G,),
      in_specs=in_specs,
      out_specs=tuple(out_specs),
      out_shape=tuple(out_shape),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(raw, coef_in, *wlist)

  dw_list, met, l2 = outs[:n_w], outs[n_w], outs[n_w + 1]

  grads = {"representation": {}, "prediction": {}, "dynamic": {}}
  for k, (net, name, w, _) in enumerate(order):
    grads[net][name] = {"w": dw_list[2 * k],
                        "b": dw_list[2 * k + 1].reshape(-1)}
  grads = type(params)(
      representation=grads["representation"],
      prediction=grads["prediction"],
      dynamic=grads["dynamic"],
      temperature=jnp.zeros_like(params.temperature))

  v_sum = met[0, :B]
  p_sum = met[1, :B]
  r_sum = met[2, :B]
  v0 = met[3, :B]
  l2 = l2[0, 0]
  denom = raw[lay.denom, :B]
  rn0 = raw[lay.rn, :B]
  per_example = (r_sum + v_sum + p_sum) / denom
  total = jnp.sum(coef * per_example * denom) + l2
  priorities = jnp.abs(v0 - rn0) ** priority_alpha
  metrics = LossMetrics(
      total=total,
      reward_loss=jnp.mean(r_sum / denom),
      value_loss=jnp.mean(v_sum / denom),
      policy_loss=jnp.mean(p_sum / denom),
      l2_loss=l2,
      priorities=jax.lax.stop_gradient(priorities),
  )
  return grads, metrics
