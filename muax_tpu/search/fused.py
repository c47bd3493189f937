"""Fused MCTS: the entire MuZero search as ONE Pallas TPU kernel.

Why: the generic XLA search (``search/core.py``) walks the tree with
``while_loop``s whose bodies are masked vector ops over ``[B, N, A]`` HBM
arrays — every tree level round-trips the whole forest through HBM
(~5 MB/level at B=1024, sims=64), so a converged (path-like) tree costs
~15 GB of HBM traffic per environment step and the search runs at ~20-25%
of the VPU's speed. This kernel keeps the *entire forest in VMEM* for all
``num_simulations`` simulations: descent, the MLP dynamics/prediction
evaluation (MXU), expansion, and backup never touch HBM until the root
summary is written out.

Scope: the flagship MLP network family (``models/networks.make_mlp_networks``)
with the MuZero PUCT policy and the ``qtransform_by_parent_and_siblings``
Q-normalization — the exact semantics of ``policies.muzero_policy`` (which
itself matches the reference's MuZeroPolicy defaults, muax/policy.py:13-30) —
plus Gumbel sequential halving, the acme categorical two-hot family
(FusedNetSpec), and (round 4) Stochastic MuZero's decision/chance
interleave over A' = A + C (``_make_smz_kernel`` below — also the fix for
the r3 TPU-runtime fault at 512 envs x 200 sims: the generic engine's
[B, N, A+C] HBM tree arrays never exist). Other network families /
policies fall back to the generic XLA engine; the dispatch lives in
``train/actor.py``.

Semantics deltas vs the XLA engine (documented, test-checked):
  * tie-breaking in PUCT argmax is deterministic (first max) instead of
    uniform-noise randomized — identical once any child has been visited;
  * ELU is computed as ``where(x>0, x, exp(x)-1)`` (Pallas has no expm1);
    bit-identical in f32 for all practical inputs.

Forest layout per batch-tile of T envs (all VMEM scratch, f32; TRANSPOSED —
envs on the 128-lane axis, tree entities on the 8-sublane axis so padding
costs sublane granularity: 65 nodes -> 72 rows, not 128 lanes):
  node arrays   [NP, T]       NP = pad(num_simulations+1, 8)
  child arrays  [NP*A, T]     row n*A+a = stats of edge (node n, action a)
  embeddings    [E, NP, T]    one plane per embedding feature

Per-env node addressing uses one-hot masked vector ops (TPU has no per-lane
dynamic gather); in VMEM these run at VPU speed and cost no HBM bandwidth.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_H_EPS = 1e-3  # value-transform epsilon (ops/support.py)


class FusedMLPWeights(NamedTuple):
  """Flat weight views for the MLP triplet's dynamic+prediction nets.

  Biases are reshaped to [1, out] (SMEM/VMEM want >=2D).
  """
  dyn_hidden: tuple  # ((W, b), ...) first W has in_dim = E + A
  dyn_reward: tuple  # (W [H, 2S+1], b)
  dyn_state: tuple   # (W [H, E], b)
  pred_hidden: tuple
  pred_value: tuple  # (W [H, 2S+1], b)
  pred_policy: tuple  # (W [H, A], b)


def _sorted_linears(module_params) -> Optional[list]:
  """hk.Linear params in creation order ('linear', 'linear_1', ...)."""
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
    if "w" not in layer or "b" not in layer:
      return None
    out.append((idx, layer["w"], layer["b"]))
  out.sort(key=lambda t: t[0])
  return [(w, jnp.reshape(b, (1, -1))) for _, w, b in out]


def extract_fused_weights(networks, params) -> Optional[FusedMLPWeights]:
  """Pull flat MLP weights out of haiku params; None if the structure is not
  the plain dense triplet (then the caller falls back to the XLA engine)."""
  num_actions = getattr(networks, "num_actions", None)
  support_size = getattr(networks, "support_size", None)
  if num_actions is None or support_size is None:
    return None
  full_support = 2 * support_size + 1

  dyn = _sorted_linears(params.dynamic)
  pred = _sorted_linears(params.prediction)
  if not dyn or not pred or len(dyn) < 3 or len(pred) < 3:
    return None

  # dynamic: hidden..., reward head (out 2S+1), next-state head (out E)
  *d_hidden, d_reward, d_state = dyn
  # prediction: hidden..., value head (out 2S+1), policy head (out A)
  *p_hidden, p_value, p_policy = pred
  embedding_dim = d_state[0].shape[1]
  checks = (
      d_reward[0].shape[1] == full_support
      and p_value[0].shape[1] == full_support
      and p_policy[0].shape[1] == num_actions
      and dyn[0][0].shape[0] == embedding_dim + num_actions
      and pred[0][0].shape[0] == embedding_dim
      and all(w.ndim == 2 for w, _ in dyn + pred)
  )
  if not checks:
    return None
  return FusedMLPWeights(
      dyn_hidden=tuple(d_hidden), dyn_reward=d_reward, dyn_state=d_state,
      pred_hidden=tuple(p_hidden), pred_value=p_value, pred_policy=p_policy)


class FusedNetSpec(NamedTuple):
  """Generic tower program for the fused kernel.

  ``dyn_layers`` / ``pred_layers``: tuples of ("elu", (w, b)) or
  ("ln_tanh", (w, b, scale, offset)) hidden layers (the acme LayerNormMLP
  idiom: Linear -> LayerNorm -> tanh first, Linear -> elu after,
  models/acme_networks.py). Heads are plain linears. ``decode``:
  "h_support" (integer h-transform two-hot, ops/support.py) or "linear"
  (vmin..vmax two-hot, rlax transform_from_2hot convention).
  """
  dyn_layers: tuple
  pred_layers: tuple
  dyn_reward: tuple   # (w, b)
  dyn_state: tuple
  pred_value: tuple
  pred_policy: tuple
  decode: str
  num_bins: int       # total support width (2S+1 for h_support)
  support_size: int   # h_support only
  vmin: float
  vmax: float


def _mlp_weights_to_spec(weights: FusedMLPWeights,
                         support_size: int) -> FusedNetSpec:
  return FusedNetSpec(
      dyn_layers=tuple(("elu", pair) for pair in weights.dyn_hidden),
      pred_layers=tuple(("elu", pair) for pair in weights.pred_hidden),
      dyn_reward=weights.dyn_reward, dyn_state=weights.dyn_state,
      pred_value=weights.pred_value, pred_policy=weights.pred_policy,
      decode="h_support", num_bins=2 * support_size + 1,
      support_size=support_size, vmin=0.0, vmax=0.0)


def _sorted_modules(module_params, prefix):
  """('linear'|'layer_norm') params in creation order; None on surprises."""
  out = {}
  for key, val in dict(module_params).items():
    if key == prefix:
      idx = 0
    elif key.startswith(prefix + "_"):
      try:
        idx = int(key[len(prefix) + 1:])
      except ValueError:
        return None
    else:
      continue
    out[idx] = val
  return [out[i] for i in range(len(out))] if out else []


def extract_categorical_fused_weights(networks, params
                                      ) -> Optional[FusedNetSpec]:
  """Build a FusedNetSpec for the acme-style categorical family
  (models/acme_networks.make_categorical_mlp_networks: LayerNormMLP towers
  + linear two-hot heads). Returns None when the structure doesn't match
  (then the caller falls back to the XLA engine)."""
  num_actions = getattr(networks, "num_actions", None)
  num_bins = getattr(networks, "num_bins", None)
  if num_actions is None or num_bins is None or num_bins == num_actions:
    return None

  def parse_tower(module_params, num_heads):
    linears = _sorted_modules(module_params, "linear")
    lns = _sorted_modules(module_params, "layer_norm")
    if linears is None or lns is None or len(linears) < num_heads:
      return None
    try:
      linears = [(jnp.asarray(m["w"]), jnp.reshape(jnp.asarray(m["b"]),
                                                   (1, -1)))
                 for m in linears]
      lns = [(jnp.reshape(jnp.asarray(m["scale"]), (1, -1)),
              jnp.reshape(jnp.asarray(m["offset"]), (1, -1)))
             for m in lns]
    except (KeyError, TypeError):
      return None
    if len(lns) > 1 or any(w.ndim != 2 for w, _ in linears):
      return None
    hidden = linears[:len(linears) - num_heads]
    heads = linears[len(linears) - num_heads:]
    layers = []
    for i, pair in enumerate(hidden):
      if i == 0 and lns:
        layers.append(("ln_tanh", pair + lns[0]))
      else:
        layers.append(("elu", pair))
    # Identify heads by output width (creation order differs per family).
    by_width = {}
    for w, b in heads:
      by_width.setdefault(w.shape[1], []).append((w, b))
    return tuple(layers), by_width

  embedding_dim = None
  dyn = params.dynamic
  pred = params.prediction
  # dynamic heads: reward [*, bins], next state [*, E]
  parsed_dyn = parse_tower(dyn, 2)
  if parsed_dyn is None:
    return None
  dyn_layers, dyn_heads = parsed_dyn
  reward_heads = dyn_heads.get(num_bins)
  other = [v for k, v in dyn_heads.items() if k != num_bins]
  if not reward_heads or len(reward_heads) != 1 or len(other) != 1 or len(
      other[0]) != 1:
    return None
  dyn_reward = reward_heads[0]
  dyn_state = other[0][0]
  embedding_dim = dyn_state[0].shape[1]
  if not dyn_layers or dyn_layers[0][1][0].shape[0] != (embedding_dim
                                                        + num_actions):
    return None

  parsed_pred = parse_tower(pred, 2)
  if parsed_pred is None:
    return None
  pred_layers, pred_heads = parsed_pred
  val = pred_heads.get(num_bins)
  pol = pred_heads.get(num_actions)
  if not val or not pol or len(val) != 1 or len(pol) != 1:
    return None
  if pred_layers and pred_layers[0][1][0].shape[0] != embedding_dim:
    return None
  return FusedNetSpec(
      dyn_layers=dyn_layers, pred_layers=pred_layers,
      dyn_reward=dyn_reward, dyn_state=dyn_state,
      pred_value=val[0], pred_policy=pol[0],
      decode="linear", num_bins=num_bins, support_size=0,
      vmin=float(networks.vmin), vmax=float(networks.vmax))


def _elu(x):
  return jnp.where(x > 0, x, jnp.exp(x) - 1.0)


def _inv_value_transform(x):
  """h^-1 (ops/support.py:26-34)."""
  eps = _H_EPS
  return jnp.sign(x) * (
      jnp.square(
          (jnp.sqrt(4.0 * eps * (jnp.abs(x) + 1.0 + eps) + 1.0) - 1.0)
          / (2.0 * eps))
      - 1.0)


def _round_up(x: int, m: int) -> int:
  return ((x + m - 1) // m) * m


def _pick_tile(batch: int, bytes_per_env: int,
               budget: int = 6 * 1024 * 1024) -> int:
  """Largest lane tile fitting the VMEM budget, balanced so grid steps
  divide the batch as evenly as possible (minimizes padded lanes). Envs are
  the LANE axis in the transposed forest layout, so tiles are multiples of
  128."""
  tmax = max(128, min(batch, budget // max(bytes_per_env, 1)))
  grid = -(-batch // tmax)
  return _round_up(-(-batch // grid), 128)


def _make_kernel(*, T: int, NP: int, A: int, E: int, S41: int,
                 dyn_kinds: tuple, pred_kinds: tuple,
                 num_simulations: int, max_depth: int, discount: float,
                 pb_c_init: float, pb_c_base: float, support_size: int,
                 decode: str = "h_support", vmin: float = 0.0,
                 vmax: float = 0.0,
                 policy: str = "muzero", NS: int = 0,
                 value_scale: float = 0.1, maxvisit_init: float = 50.0):
  """Build the kernel body (TRANSPOSED layout: tree entities on sublanes,
  environments on lanes).

  Arrays are [entity, T] with T = envs-per-tile on the 128-lane axis and
  entities (nodes NP / child edges CP = NP*A) on the 8-sublane axis, so
  padding costs sublane granularity (65 nodes -> 72 rows) instead of lane
  granularity (65 -> 128 lanes) — ~1.8x less VPU work per tree level than
  the row layout, which is what the per-level masked passes are bound by in
  the trained (deep-tree) regime. Inputs/outputs arrive pre-transposed
  ([feature, B]); the XLA caller pays the cheap one-off transposes.

  Weight refs arrive flattened in FusedNetSpec order (per hidden layer:
  w, b for "elu"; w, b, ln_scale, ln_offset for "ln_tanh"; then the four
  heads) with vectors reshaped [out, 1]; see _fused_search for the call
  layout. ``decode`` selects the value-head convention: integer h-transform
  support or linear [vmin, vmax] two-hot (acme CategoricalCriticHead).

  ``policy``: 'muzero' (PUCT descent + parent-and-siblings qtransform) or
  'gumbel' (sequential-halving root + improved-policy interior +
  completed-by-mix-value qtransform — policies.gumbel_muzero_policy
  semantics). Gumbel adds two input refs after ``invalid_ref``:
  root_score_ref [A, T] = gumbel + prior_logits (their only use is summed),
  sched_ref [NS, T] = per-row considered-visit schedule
  (seq_halving.considered_visit_table row for this row's valid-action
  count), NS = pad(num_simulations, 8).
  """
  CP = NP * A
  N = num_simulations + 1
  is_gumbel = policy == "gumbel"

  def kernel(*refs):
    (root_emb_ref, root_logits_ref, root_value_ref, invalid_ref) = refs[:4]
    base = 4
    if is_gumbel:
      root_score_ref, sched_ref = refs[4:6]
      base = 6
    n_wrefs = (sum(2 if k == "elu" else 4 for k in dyn_kinds + pred_kinds)
               + 8)
    wrefs = list(refs[base:base + n_wrefs])
    out_visits_ref, out_value_ref, out_q_ref = refs[
        base + n_wrefs:base + 3 + n_wrefs]
    (nvis_ref, nval_ref, nraw_ref, npar_ref, nact_ref,
     cidx_ref, cpri_ref, cvis_ref, crew_ref, cval_ref,
     emb_ref) = refs[base + 3 + n_wrefs:]

    cursor = [0]

    def take(n):
      vals = tuple(r[:] for r in wrefs[cursor[0]:cursor[0] + n])
      cursor[0] += n
      return vals

    dyn_layers = [(k, take(2 if k == "elu" else 4)) for k in dyn_kinds]
    dyn_reward = take(2)
    dyn_state = take(2)
    pred_layers = [(k, take(2 if k == "elu" else 4)) for k in pred_kinds]
    pred_value = take(2)
    pred_policy = take(2)

    def matTx(w, x):
      """[in, out] x [in, T] -> [out, T] (contract the shared leading dim —
      the transposed-layout matmul; MXU via dot_general)."""
      return jax.lax.dot_general(w, x, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)

    # Per-env scalars (node indices, actions, masks) are [1, T] f32 rows:
    # sublane broadcast over [NP/CP, T] is the cheap direction on TPU.
    # Indices <= num_nodes are exact in f32.
    nrow = jax.lax.broadcasted_iota(jnp.int32, (NP, T), 0).astype(jnp.float32)
    crow = jax.lax.broadcasted_iota(jnp.int32, (CP, T), 0).astype(jnp.float32)
    row_n = jnp.floor(crow / A)
    invalid_cp = jnp.tile(invalid_ref[:], (NP, 1))  # row -> invalid[row % A]
    if is_gumbel:
      # Schedule rows + the root's (gumbel + prior logits) tiled onto the
      # child-edge layout (only node 0's rows are ever read).
      scol = (jax.lax.broadcasted_iota(jnp.int32, (NS, T), 0)
              .astype(jnp.float32))
      root_score_cp = jnp.tile(root_score_ref[:], (NP, 1))

    # ---- forest init (scratch persists across grid steps: assign fully) ----
    root_row = nrow == 0.0
    rv = root_value_ref[:]  # [1, T]
    nvis_ref[:] = jnp.where(root_row, 1.0, 0.0)
    nval_ref[:] = jnp.where(root_row, rv, 0.0)
    nraw_ref[:] = jnp.where(root_row, rv, 0.0)
    npar_ref[:] = jnp.full((NP, T), -1.0, jnp.float32)
    nact_ref[:] = jnp.full((NP, T), -1.0, jnp.float32)
    cidx_ref[:] = jnp.full((CP, T), -1.0, jnp.float32)
    logits = root_logits_ref[:]
    probs = jax.nn.softmax(logits, axis=0)
    cpri_ref[:] = jnp.where(row_n == 0.0, jnp.tile(probs, (NP, 1)), 0.0)
    cvis_ref[:] = jnp.zeros((CP, T), jnp.float32)
    crew_ref[:] = jnp.zeros((CP, T), jnp.float32)
    cval_ref[:] = jnp.zeros((CP, T), jnp.float32)
    for e in range(E):
      emb_ref[e] = jnp.where(root_row, root_emb_ref[e:e + 1, :], 0.0)

    def gather_np(ref, oh):
      return jnp.sum(jnp.where(oh, ref[:], 0.0), axis=0, keepdims=True)

    # [1, T] zero with the layout of a cross-sublane reduction: while-loop
    # carries must be layout-consistent with the reduce-produced updates in
    # the loop body, so every carry is initialized from this.
    zero_r = jnp.sum(invalid_ref[:] * 0.0, axis=0, keepdims=True)

    def decode_support(logits_):
      """[S41, T] support logits -> [1, T] scalar (two decode conventions:
      integer h-transform bins, ops/support.py, or linear vmin..vmax bins,
      the rlax transform_from_2hot used by acme CategoricalCriticHead)."""
      p = jax.nn.softmax(logits_, axis=0)
      idx = (jax.lax.broadcasted_iota(jnp.int32, (S41, T), 0)
             .astype(jnp.float32))
      if decode == "linear":
        bins = vmin + idx * ((vmax - vmin) / (S41 - 1))
        return jnp.sum(p * bins, axis=0, keepdims=True)
      bins = idx - float(support_size)
      return _inv_value_transform(
          jnp.sum(p * bins, axis=0, keepdims=True))  # [1, T]

    def run_tower(x, layers, first_split=None):
      """Run hidden layers in [feature, T] layout. ``first_split`` =
      (emb [E, T], a_oh [A, T]) splits the first layer's input matmul
      (dynamics consumes concat(s, one_hot(a)))."""
      for i, (kind, prs) in enumerate(layers):
        w, b = prs[0], prs[1]
        if i == 0 and first_split is not None:
          emb_x, a_x = first_split
          h = matTx(w[:E], emb_x) + matTx(w[E:], a_x) + b
        else:
          h = matTx(w, x) + b
        if kind == "elu":
          x = _elu(h)
        else:  # ln_tanh: Linear -> LayerNorm -> tanh (acme LayerNormMLP)
          scale, offset = prs[2], prs[3]
          mean = jnp.mean(h, axis=0, keepdims=True)
          var = jnp.mean(jnp.square(h - mean), axis=0, keepdims=True)
          x = jnp.tanh((h - mean) * jax.lax.rsqrt(var + 1e-5) * scale
                       + offset)
      return x

    def _completed_q(cur):
      """qtransform_completed_by_mix_value over node ``cur``'s rows:
      (completed_q [CP, T] valid on rowmask, rowmask, cvis)."""
      node_oh = nrow == cur
      rowmask = row_n == cur
      nraw = gather_np(nraw_ref, node_oh)                     # [1, T]
      cvis = cvis_ref[:]
      q = crew_ref[:] + discount * cval_ref[:]
      visited = jnp.logical_and(cvis > 0.0, rowmask)
      pri = jnp.where(rowmask, cpri_ref[:], 0.0)
      sum_visits = jnp.sum(jnp.where(rowmask, cvis, 0.0), axis=0,
                           keepdims=True)
      visited_probs = jnp.where(visited, pri, 0.0)
      sum_probs = jnp.sum(visited_probs, axis=0, keepdims=True)
      weighted_q = (jnp.sum(visited_probs * q, axis=0, keepdims=True)
                    / jnp.maximum(sum_probs, 1e-8))
      v_mix = (nraw + sum_visits * weighted_q) / (sum_visits + 1.0)
      completed = jnp.where(visited, q, v_mix)
      low = jnp.min(jnp.where(rowmask, completed, -_NEG), axis=0,
                    keepdims=True)
      high = jnp.max(jnp.where(rowmask, completed, _NEG), axis=0,
                     keepdims=True)
      completed = (completed - low) / jnp.maximum(high - low, 1e-8)
      maxvisit = jnp.max(jnp.where(rowmask, cvis, 0.0), axis=0,
                         keepdims=True)
      cq = (maxvisit_init + maxvisit) * value_scale * completed
      return cq, rowmask, cvis

    # ---------------------------- simulation loop -------------------------
    def sim_body(s, _):
      # -- descent: lockstep walk until an unexpanded child ---------------
      def d_cond(c):
        return jnp.any(c[4] > 0.0)

      def _muzero_score(cur, depth, s):
        """PUCT with qtransform_by_parent_and_siblings (qtransforms.py)."""
        node_oh = nrow == cur
        nvisit = gather_np(nvis_ref, node_oh)   # [1, T]
        nvalue = gather_np(nval_ref, node_oh)
        rowmask = row_n == cur
        cvis = cvis_ref[:]
        q = crew_ref[:] + discount * cval_ref[:]
        visited = cvis > 0.0
        safe_q = jnp.where(visited, q, nvalue)
        minq = jnp.min(jnp.where(rowmask, safe_q, _NEG * -1.0), axis=0,
                       keepdims=True)
        maxq = jnp.max(jnp.where(rowmask, safe_q, _NEG), axis=0,
                       keepdims=True)
        minv = jnp.minimum(nvalue, minq)
        maxv = jnp.maximum(nvalue, maxq)
        completed = jnp.where(visited, q, minv)
        qn = (completed - minv) / jnp.maximum(maxv - minv, 1e-8)
        pb_c = pb_c_init + jnp.log((nvisit + pb_c_base + 1.0) / pb_c_base)
        policy_score = (jnp.sqrt(nvisit) * pb_c) * cpri_ref[:] / (cvis + 1.0)
        score = qn + policy_score
        score = jnp.where(
            jnp.logical_and(depth == 0, invalid_cp > 0.0), _NEG, score)
        return jnp.where(rowmask, score, _NEG)

      def _gumbel_root_score(s):
        """Sequential halving at the root: among actions whose visit count
        equals the schedule, g + logits + sigma(q-hat)
        (action_selection.py:77-103)."""
        cq, rowmask, cvis = _completed_q(zero_r)
        sched = jnp.sum(
            jnp.where(scol == s.astype(jnp.float32), sched_ref[:], 0.0),
            axis=0, keepdims=True)                           # [1, T]
        score = jnp.where(cvis == sched, root_score_cp + cq, _NEG)
        score = jnp.where(invalid_cp > 0.0, _NEG, score)
        return jnp.where(rowmask, score, _NEG)

      def _gumbel_interior_score(cur):
        """Improved-policy tracking pi' - n/(1+N) with completed_by_mix
        (action_selection.py:106-128)."""
        cq, rowmask, cvis = _completed_q(cur)
        logp = jnp.log(jnp.maximum(cpri_ref[:], 1e-30)) + cq
        m = jnp.max(jnp.where(rowmask, logp, _NEG), axis=0,
                    keepdims=True)
        e = jnp.where(rowmask, jnp.exp(logp - m), 0.0)
        probs = e / jnp.maximum(jnp.sum(e, axis=0, keepdims=True), 1e-30)
        sum_visits = jnp.sum(jnp.where(rowmask, cvis, 0.0), axis=0,
                             keepdims=True)
        score = probs - cvis / (1.0 + sum_visits)
        return jnp.where(rowmask, score, _NEG)

      def _select(score):
        """argmax as max + lowest matching row (ties -> first).
        Returns (best row [1,T], action [1,T], child index [1,T])."""
        m = jnp.max(score, axis=0, keepdims=True)
        best = jnp.min(jnp.where(score >= m, crow, 3e7), axis=0,
                       keepdims=True)                    # [1, T] f32
        a = best - jnp.floor(best / A) * A
        child = jnp.sum(jnp.where(crow == best, cidx_ref[:], 0.0), axis=0,
                        keepdims=True)
        return best, a, child

      def d_body(c):
        cur, parent, act, depth, active = c
        if is_gumbel:
          score = _gumbel_interior_score(cur)
        else:
          score = _muzero_score(cur, depth, s)
        _, a, child = _select(score)
        on = active > 0.0
        parent = jnp.where(on, cur, parent)
        act = jnp.where(on, a, act)
        cur = jnp.where(on, child, cur)
        depth = depth + 1
        still = jnp.where(depth < max_depth, 1.0, 0.0)
        active = active * jnp.where(child == -1.0, 0.0, 1.0) * still
        return cur, parent, act, depth, active

      if is_gumbel:
        # Peel the root step: sequential halving applies exactly once per
        # simulation (depth 0), so it stays out of the descent loop.
        _, a0, child0 = _select(_gumbel_root_score(s))
        init = (child0, zero_r, a0, jnp.asarray(1, jnp.int32),
                jnp.where(child0 == -1.0, 0.0, 1.0)
                * (1.0 if max_depth > 1 else 0.0))
      else:
        init = (zero_r, zero_r - 1.0, zero_r - 1.0,
                jnp.asarray(0, jnp.int32), zero_r + 1.0)
      cur, parent, act, _, _ = jax.lax.while_loop(d_cond, d_body, init)

      # slot: fresh node s+1 unless the depth cap stopped on an existing
      # child (then re-evaluate that node; core.search body semantics)
      edge = parent * A + act
      edge_mask = crow == edge
      existing = jnp.sum(jnp.where(edge_mask, cidx_ref[:], 0.0), axis=0,
                         keepdims=True)
      slot = jnp.where(existing < 0.0, (s + 1).astype(jnp.float32),
                       existing)  # [1, T]

      # -- expand: MLP dynamics + prediction on the MXU -------------------
      parent_oh = nrow == parent
      emb = jnp.concatenate(
          [jnp.sum(jnp.where(parent_oh, emb_ref[e], 0.0), axis=0,
                   keepdims=True) for e in range(E)], axis=0)  # [E, T]
      a_oh = (jax.lax.broadcasted_iota(jnp.int32, (A, T), 0)
              .astype(jnp.float32) == act).astype(jnp.float32)
      h = run_tower(None, dyn_layers, first_split=(emb, a_oh))
      reward = decode_support(matTx(dyn_reward[0], h) + dyn_reward[1])
      ns = matTx(dyn_state[0], h) + dyn_state[1]           # [E, T]
      ns_min = jnp.min(ns, axis=0, keepdims=True)
      ns_max = jnp.max(ns, axis=0, keepdims=True)
      ns = (ns - ns_min) / jnp.maximum(ns_max - ns_min, 1e-8)
      g = run_tower(ns, pred_layers)
      value = decode_support(matTx(pred_value[0], g) + pred_value[1])
      pol = matTx(pred_policy[0], g) + pred_policy[1]
      pol = jax.nn.softmax(pol, axis=0)  # prior probs [A, T]

      # -- install the node (update_tree_node semantics: running-mean) ----
      slot_oh = nrow == slot
      count = gather_np(nvis_ref, slot_oh)
      oldv = gather_np(nval_ref, slot_oh)
      blended = (oldv * count + value) / (count + 1.0)
      nvis_ref[:] = nvis_ref[:] + jnp.where(slot_oh, 1.0, 0.0)
      nval_ref[:] = jnp.where(slot_oh, blended, nval_ref[:])
      nraw_ref[:] = jnp.where(slot_oh, value, nraw_ref[:])
      npar_ref[:] = jnp.where(slot_oh, parent, npar_ref[:])
      nact_ref[:] = jnp.where(slot_oh, act, nact_ref[:])
      slot_rows = row_n == slot
      cpri_ref[:] = jnp.where(slot_rows, jnp.tile(pol, (NP, 1)), cpri_ref[:])
      crew_ref[:] = jnp.where(edge_mask, reward, crew_ref[:])
      cidx_ref[:] = jnp.where(edge_mask, slot, cidx_ref[:])
      for e in range(E):
        emb_ref[e] = jnp.where(slot_oh, ns[e:e + 1, :], emb_ref[e])

      # -- backup along parent pointers ------------------------------------
      def b_cond(c):
        return jnp.any(c[0] != 0.0)

      def b_body(c):
        idx, v = c
        activeb = jnp.where(idx != 0.0, 1.0, 0.0)   # [1, T] f32
        idx_oh = nrow == idx
        par = jnp.sum(jnp.where(idx_oh, npar_ref[:], 0.0), axis=0,
                      keepdims=True)
        a_b = jnp.sum(jnp.where(idx_oh, nact_ref[:], 0.0), axis=0,
                      keepdims=True)
        par_oh = nrow == par
        cnt = gather_np(nvis_ref, par_oh)
        em = crow == (par * A + a_b)
        r = jnp.sum(jnp.where(em, crew_ref[:], 0.0), axis=0, keepdims=True)
        vnew = r + discount * v
        pval = (gather_np(nval_ref, par_oh) * cnt + vnew) / (cnt + 1.0)
        child_val = gather_np(nval_ref, idx_oh)
        wm_np = jnp.where(par_oh, activeb, 0.0) > 0.0
        nval_ref[:] = jnp.where(wm_np, pval, nval_ref[:])
        nvis_ref[:] = nvis_ref[:] + jnp.where(wm_np, 1.0, 0.0)
        wm_cp = jnp.where(em, activeb, 0.0) > 0.0
        cval_ref[:] = jnp.where(wm_cp, child_val, cval_ref[:])
        cvis_ref[:] = cvis_ref[:] + jnp.where(wm_cp, 1.0, 0.0)
        on = activeb > 0.0
        v = jnp.where(on, vnew, v)
        idx = jnp.where(on, par, idx)
        return idx, v

      jax.lax.while_loop(b_cond, b_body, (slot, value))
      return 0

    jax.lax.fori_loop(0, num_simulations, sim_body, 0)

    # ---- root summary ----------------------------------------------------
    out_visits_ref[:] = cvis_ref[:A, :]
    out_value_ref[:] = nval_ref[:1, :]
    if is_gumbel:
      # Gumbel consumers need sigma(q-hat) at the root (action weights are
      # softmax(logits + completed_q), policies.py:166-171).
      cq_root, _, _ = _completed_q(zero_r)
      out_q_ref[:] = cq_root[:A, :]
    else:
      out_q_ref[:] = crew_ref[:A, :] + discount * cval_ref[:A, :]

  return kernel


def _fused_search(
    root_embedding: jax.Array,      # [B, E]
    root_prior_logits: jax.Array,   # [B, A] (noise/masking already applied)
    root_value: jax.Array,          # [B]
    weights: FusedMLPWeights,
    *,
    policy: str,
    num_simulations: int,
    support_size: Optional[int] = None,
    discount: float,
    invalid_actions: Optional[jax.Array] = None,
    max_depth: Optional[int] = None,
    pb_c_init: float = 1.25,
    pb_c_base: float = 19652.0,
    batch_tile: Optional[int] = None,
    interpret: Optional[bool] = None,
    root_score: Optional[jax.Array] = None,   # gumbel: g + logits [B, A]
    schedule: Optional[jax.Array] = None,     # gumbel: [B, S] f32 visits
):
  """Shared driver for the fused kernels. Returns (visit_counts [B, A] f32,
  root_value [B], root_q [B, A]) — root_q is raw r+gamma*v for 'muzero' and
  the completed/transformed sigma(q-hat) for 'gumbel'.

  Public arrays are env-major [B, ...]; the kernel runs the TRANSPOSED
  forest layout (envs on lanes), so inputs/outputs are transposed here —
  cheap one-off XLA transposes outside the hot loop.
  """
  if isinstance(weights, FusedMLPWeights):
    if support_size is None:
      raise ValueError("support_size is required with FusedMLPWeights")
    spec = _mlp_weights_to_spec(weights, support_size)
  else:
    spec = weights
  B, E = root_embedding.shape
  A = root_prior_logits.shape[-1]
  S41 = spec.num_bins
  N = num_simulations + 1
  NP = _round_up(N, 8)       # nodes on sublanes
  CP = NP * A
  NS = _round_up(num_simulations, 8)
  if max_depth is None:
    max_depth = num_simulations
  if invalid_actions is None:
    invalid_actions = jnp.zeros((B, A), jnp.float32)
  if interpret is None:
    interpret = jax.default_backend() == "cpu"
  is_gumbel = policy == "gumbel"

  bytes_per_env = 4 * (5 * NP + 5 * CP + E * NP)
  T = batch_tile or _pick_tile(B, bytes_per_env)
  G = -(-B // T)  # grid steps
  BP = G * T

  # Transpose to [feature, B] kernel layout.
  inputs = [root_embedding.astype(jnp.float32).T,
            root_prior_logits.astype(jnp.float32).T,
            root_value.astype(jnp.float32)[None, :],
            invalid_actions.astype(jnp.float32).T]
  if is_gumbel:
    sched_padded = jnp.zeros((NS, B), jnp.float32)
    sched_padded = sched_padded.at[:schedule.shape[1], :].set(
        schedule.astype(jnp.float32).T)
    inputs += [root_score.astype(jnp.float32).T, sched_padded]
  if BP != B:
    pad = BP - B
    inputs = [jnp.pad(x, ((0, 0), (0, pad))) for x in inputs]

  dyn_kinds = tuple(k for k, _ in spec.dyn_layers)
  pred_kinds = tuple(k for k, _ in spec.pred_layers)
  wlist = []

  def flat(arrs):
    # Matmul weights stay [in, out] (the kernel contracts the leading dim);
    # vectors (bias / ln scale / ln offset) become columns [out, 1].
    for i, a in enumerate(arrs):
      a = jnp.asarray(a, jnp.float32)
      wlist.append(a if i == 0 else jnp.reshape(a, (-1, 1)))

  for _, prs in spec.dyn_layers:
    flat(prs)
  flat(spec.dyn_reward)
  flat(spec.dyn_state)
  for _, prs in spec.pred_layers:
    flat(prs)
  flat(spec.pred_value)
  flat(spec.pred_policy)

  kernel = _make_kernel(
      T=T, NP=NP, A=A, E=E, S41=S41,
      dyn_kinds=dyn_kinds, pred_kinds=pred_kinds,
      num_simulations=num_simulations, max_depth=max_depth,
      discount=discount, pb_c_init=pb_c_init, pb_c_base=pb_c_base,
      support_size=spec.support_size, decode=spec.decode,
      vmin=spec.vmin, vmax=spec.vmax, policy=policy, NS=NS)

  def col_spec(rows):
    return pl.BlockSpec((rows, T), lambda i: (0, i),
                        memory_space=pltpu.VMEM)

  def const_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)

  in_specs = [col_spec(E), col_spec(A), col_spec(1), col_spec(A)]
  if is_gumbel:
    in_specs += [col_spec(A), col_spec(NS)]
  in_specs += [const_spec(w.shape) for w in wlist]

  visits, value, qvalues = pl.pallas_call(
      kernel,
      grid=(G,),
      in_specs=in_specs,
      out_specs=(col_spec(A), col_spec(1), col_spec(A)),
      out_shape=(
          jax.ShapeDtypeStruct((A, BP), jnp.float32),
          jax.ShapeDtypeStruct((1, BP), jnp.float32),
          jax.ShapeDtypeStruct((A, BP), jnp.float32),
      ),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      scratch_shapes=[
          pltpu.VMEM((NP, T), jnp.float32),   # node visits
          pltpu.VMEM((NP, T), jnp.float32),   # node values
          pltpu.VMEM((NP, T), jnp.float32),   # node raw values
          pltpu.VMEM((NP, T), jnp.float32),   # parents (f32 indices — exact)
          pltpu.VMEM((NP, T), jnp.float32),   # action from parent
          pltpu.VMEM((CP, T), jnp.float32),   # children index
          pltpu.VMEM((CP, T), jnp.float32),   # children prior probs
          pltpu.VMEM((CP, T), jnp.float32),   # children visits
          pltpu.VMEM((CP, T), jnp.float32),   # children rewards
          pltpu.VMEM((CP, T), jnp.float32),   # children values
          pltpu.VMEM((E, NP, T), jnp.float32),  # embeddings (per-feature)
      ],
      interpret=interpret,
  )(*inputs, *wlist)

  return visits[:, :B].T, value[0, :B], qvalues[:, :B].T


def fused_muzero_search(
    root_embedding: jax.Array,
    root_prior_logits: jax.Array,
    root_value: jax.Array,
    weights: FusedMLPWeights,
    **kwargs,
):
  """Run the fused MuZero PUCT search. Returns (visit_counts [B, A] f32,
  root_value [B], root_qvalues [B, A]) — the SearchSummary fields the
  policies consume."""
  return _fused_search(root_embedding, root_prior_logits, root_value,
                       weights, policy="muzero", **kwargs)


def fused_gumbel_search(
    root_embedding: jax.Array,
    root_prior_logits: jax.Array,   # masked original logits (no noise)
    root_value: jax.Array,
    weights: FusedMLPWeights,
    *,
    gumbel: jax.Array,              # [B, A] pre-scaled gumbel noise
    max_num_considered_actions: int,
    num_simulations: int,
    invalid_actions: Optional[jax.Array] = None,
    **kwargs,
):
  """Run the fused Gumbel MuZero search (sequential-halving root +
  improved-policy interior + completed_by_mix_value). Returns
  (visit_counts [B, A], root_value [B], root_completed_q [B, A])."""
  from muax_tpu.search import seq_halving
  A = root_prior_logits.shape[-1]
  table = jnp.asarray(seq_halving.considered_visit_table(
      max_num_considered_actions, num_simulations), jnp.float32)
  if invalid_actions is None:
    num_valid = jnp.full((root_prior_logits.shape[0],), A, jnp.int32)
  else:
    num_valid = jnp.sum(1 - invalid_actions, axis=-1).astype(jnp.int32)
  num_considered = jnp.minimum(max_num_considered_actions, num_valid)
  schedule = table[num_considered]                       # [B, S]
  return _fused_search(
      root_embedding, root_prior_logits, root_value, weights,
      policy="gumbel", num_simulations=num_simulations,
      invalid_actions=invalid_actions,
      root_score=gumbel + root_prior_logits, schedule=schedule, **kwargs)


def fused_mlp_muzero_policy(
    params: Any,
    rng: jax.Array,
    root,                      # RootFnOutput from make_root_fn
    weights: FusedMLPWeights,
    *,
    num_simulations: int,
    support_size: int,
    discount: float,
    invalid_actions: Optional[jax.Array] = None,
    max_depth: Optional[int] = None,
    dirichlet_fraction: float = 0.25,
    dirichlet_alpha: float = 0.3,
    pb_c_init: float = 1.25,
    pb_c_base: float = 19652.0,
    temperature=1.0,
    batch_tile: Optional[int] = None,
):
  """Drop-in for ``policies.muzero_policy`` on the fused path.

  Same RNG split layout and root noising as muzero_policy; returns
  (action [B] i32, action_weights [B, A], root_value [B]).
  """
  del params
  from muax_tpu.search.policies import (_add_dirichlet_noise,
                                        _apply_temperature,
                                        _get_logits_from_probs,
                                        _mask_invalid)
  rng, noise_rng, _search_rng, sample_rng = jax.random.split(rng, 4)
  probs = jax.nn.softmax(root.prior_logits, axis=-1)
  probs = _add_dirichlet_noise(noise_rng, probs, fraction=dirichlet_fraction,
                               alpha=dirichlet_alpha)
  noised_logits = _get_logits_from_probs(probs)
  noised_logits = _mask_invalid(noised_logits, invalid_actions)

  visit_counts, root_value, _ = fused_muzero_search(
      root.embedding, noised_logits, root.value, weights,
      num_simulations=num_simulations, support_size=support_size,
      discount=discount, invalid_actions=invalid_actions,
      max_depth=max_depth, pb_c_init=pb_c_init, pb_c_base=pb_c_base,
      batch_tile=batch_tile)

  total = jnp.sum(visit_counts, axis=-1, keepdims=True)
  action_weights = jnp.where(
      total > 0, visit_counts / jnp.maximum(total, 1.0),
      1.0 / visit_counts.shape[-1])
  action_logits = _apply_temperature(
      _get_logits_from_probs(action_weights), temperature)
  action = jax.random.categorical(sample_rng, action_logits).astype(jnp.int32)
  return action, action_weights, root_value


def fused_mlp_gumbel_policy(
    params: Any,
    rng: jax.Array,
    root,                      # RootFnOutput from make_root_fn
    weights: FusedMLPWeights,
    *,
    num_simulations: int,
    support_size: int,
    discount: float,
    invalid_actions: Optional[jax.Array] = None,
    max_depth: Optional[jax.Array] = None,
    max_num_considered_actions: int = 16,
    gumbel_scale: float = 1.0,
    batch_tile: Optional[int] = None,
):
  """Drop-in for ``policies.gumbel_muzero_policy`` on the fused path.

  Same RNG layout and output semantics: final action = argmax of
  g + logits + sigma(q-hat) among max-visit actions; action_weights =
  softmax(logits + completed_q) (policies.py:113-171).
  """
  del params
  from muax_tpu.search.policies import _mask_invalid
  rng, gumbel_rng, _search_rng = jax.random.split(rng, 3)
  masked_logits = _mask_invalid(root.prior_logits, invalid_actions)
  gumbel = gumbel_scale * jax.random.gumbel(
      gumbel_rng, root.prior_logits.shape, root.prior_logits.dtype)

  visit_counts, root_value, completed_q = fused_gumbel_search(
      root.embedding, masked_logits, root.value, weights,
      gumbel=gumbel, max_num_considered_actions=max_num_considered_actions,
      num_simulations=num_simulations, support_size=support_size,
      discount=discount, invalid_actions=invalid_actions,
      max_depth=max_depth, batch_tile=batch_tile)

  considered_visit = jnp.max(visit_counts, axis=-1, keepdims=True)
  score = jnp.where(visit_counts == considered_visit,
                    gumbel + masked_logits + completed_q, -jnp.inf)
  score = _mask_invalid(score, invalid_actions)
  action = jnp.argmax(score, axis=-1).astype(jnp.int32)
  action_weights = jax.nn.softmax(
      _mask_invalid(masked_logits + completed_q, invalid_actions), -1)
  return action, action_weights, root_value


# ---------------------------------------------------------------------------
# Stochastic MuZero: decision/chance interleave over A' = A + C as one kernel
# ---------------------------------------------------------------------------


class FusedSMZWeights(NamedTuple):
  """Flat weight views for the SMZ interior nets (decision / chance /
  prediction towers, models/stochastic_networks.py). Node type is derived,
  not stored: a node created by a chance outcome (creating action >= A) is
  a decision node, the root is a decision node, everything else is an
  afterstate (chance node) — strict alternation by construction
  (search/policies.py:195-204)."""
  dec_layers: tuple    # ((W, b), ...) elu hidden; first W in = E + A
  dec_state: tuple     # (W [H, E], b)   afterstate head (creation order 1st)
  dec_chance: tuple    # (W [H, C], b)
  dec_value: tuple     # (W [H, 2S+1], b)
  ch_layers: tuple     # first W in = E + C
  ch_state: tuple      # (W [H, E], b)
  ch_reward: tuple     # (W [H, 2S+1], b)
  pred_layers: tuple
  pred_policy: tuple   # (W [H, A], b)
  pred_value: tuple    # (W [H, 2S+1], b)


def extract_smz_fused_weights(networks, params) -> Optional[FusedSMZWeights]:
  """Pull the 3 interior towers out of SMZParams; None when the structure
  is not the plain dense 5-net (caller falls back to the XLA engine)."""
  A = getattr(networks, "num_actions", None)
  C = getattr(networks, "num_chance_outcomes", None)
  S = getattr(networks, "support_size", None)
  if A is None or C is None or S is None:
    return None
  S41 = 2 * S + 1
  dec = _sorted_linears(params.decision)
  ch = _sorted_linears(params.chance)
  pred = _sorted_linears(params.prediction)
  if not dec or not ch or not pred or len(dec) < 4 or len(ch) < 3 or len(
      pred) < 3:
    return None
  # Creation order (make_stochastic_mlp_networks): decision = hidden...,
  # afterstate(E), chance(C), value(S41); chance = hidden..., state(E),
  # reward(S41); prediction = hidden..., policy(A), value(S41).
  *d_hidden, d_state, d_chance, d_value = dec
  *c_hidden, c_state, c_reward = ch
  *p_hidden, p_policy, p_value = pred
  E = d_state[0].shape[1]
  ok = (d_chance[0].shape[1] == C and d_value[0].shape[1] == S41
        and c_state[0].shape[1] == E and c_reward[0].shape[1] == S41
        and p_policy[0].shape[1] == A and p_value[0].shape[1] == S41
        and dec[0][0].shape[0] == E + A and ch[0][0].shape[0] == E + C
        and pred[0][0].shape[0] == E)
  if not ok:
    return None
  return FusedSMZWeights(
      dec_layers=tuple(d_hidden), dec_state=d_state, dec_chance=d_chance,
      dec_value=d_value, ch_layers=tuple(c_hidden), ch_state=c_state,
      ch_reward=c_reward, pred_layers=tuple(p_hidden),
      pred_policy=p_policy, pred_value=p_value)


def _make_smz_kernel(*, T: int, NP: int, AD: int, C: int, E: int, S41: int,
                     n_dec_hidden: int, n_ch_hidden: int, n_pred_hidden: int,
                     num_simulations: int, max_depth: int, discount: float,
                     pb_c_init: float, pb_c_base: float, support_size: int):
  """Stochastic-MuZero forest kernel (policies.stochastic_muzero_policy
  semantics over the extended action space A' = AD + C):

    * decision nodes score their AD decision slots with MuZero PUCT +
      parent-and-siblings qtransform; chance nodes track their prior with
      p(o) - n(o)/(1+N) over the C chance slots
      (_stochastic_interior_selection);
    * expansion runs decision, chance AND prediction towers and blends by
      the parent's node type (the both-branches idiom of
      _make_stochastic_recurrent_fn — cheaper than divergence in lockstep);
    * rewards and the environment discount live on CHANCE edges only;
      decision edges are reward-0 discount-1 (policies.py:206-211) — the
      per-edge discount is derived from the SLOT index, which is exact
      because decision slots of chance nodes (and vice versa) are never
      expanded.
  """
  AP = AD + C
  CP = NP * AP

  def kernel(*refs):
    (root_emb_ref, root_logits_ref, root_value_ref, invalid_ref) = refs[:4]
    n_wrefs = 2 * (n_dec_hidden + 3 + n_ch_hidden + 2 + n_pred_hidden + 2)
    wrefs = list(refs[4:4 + n_wrefs])
    out_visits_ref, out_value_ref, out_q_ref = refs[4 + n_wrefs:7 + n_wrefs]
    (nvis_ref, nval_ref, nraw_ref, npar_ref, nact_ref,
     cidx_ref, cpri_ref, cvis_ref, crew_ref, cval_ref,
     emb_ref) = refs[7 + n_wrefs:]

    cursor = [0]

    def take():
      w = wrefs[cursor[0]][:]
      b = wrefs[cursor[0] + 1][:]
      cursor[0] += 2
      return w, b

    dec_hidden = [take() for _ in range(n_dec_hidden)]
    dec_state = take()
    dec_chance = take()
    dec_value = take()
    ch_hidden = [take() for _ in range(n_ch_hidden)]
    ch_state = take()
    ch_reward = take()
    pred_hidden = [take() for _ in range(n_pred_hidden)]
    pred_policy = take()
    pred_value = take()

    def matTx(w, x):
      return jax.lax.dot_general(w, x, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)

    nrow = jax.lax.broadcasted_iota(jnp.int32, (NP, T), 0).astype(jnp.float32)
    crow = jax.lax.broadcasted_iota(jnp.int32, (CP, T), 0).astype(jnp.float32)
    row_n = jnp.floor(crow / AP)
    slot_a = crow - row_n * AP
    dec_slot = (slot_a < AD).astype(jnp.float32)        # [CP, T] static
    gamma_cp = dec_slot + (1.0 - dec_slot) * discount   # per-edge discount
    invalid_cp = jnp.tile(invalid_ref[:], (NP, 1))

    # ---- forest init (root = decision node; chance slots pre-masked in
    # the extended root logits) ----
    root_row = nrow == 0.0
    rv = root_value_ref[:]
    nvis_ref[:] = jnp.where(root_row, 1.0, 0.0)
    nval_ref[:] = jnp.where(root_row, rv, 0.0)
    nraw_ref[:] = jnp.where(root_row, rv, 0.0)
    npar_ref[:] = jnp.full((NP, T), -1.0, jnp.float32)
    nact_ref[:] = jnp.full((NP, T), -1.0, jnp.float32)
    cidx_ref[:] = jnp.full((CP, T), -1.0, jnp.float32)
    probs = jax.nn.softmax(root_logits_ref[:], axis=0)
    cpri_ref[:] = jnp.where(row_n == 0.0, jnp.tile(probs, (NP, 1)), 0.0)
    cvis_ref[:] = jnp.zeros((CP, T), jnp.float32)
    crew_ref[:] = jnp.zeros((CP, T), jnp.float32)
    cval_ref[:] = jnp.zeros((CP, T), jnp.float32)
    for e in range(E):
      emb_ref[e] = jnp.where(root_row, root_emb_ref[e:e + 1, :], 0.0)

    def gather_np(ref_or_val, oh):
      v = ref_or_val[:] if hasattr(ref_or_val, "at") else ref_or_val
      return jnp.sum(jnp.where(oh, v, 0.0), axis=0, keepdims=True)

    zero_r = jnp.sum(invalid_ref[:1, :] * 0.0, axis=0, keepdims=True)

    def node_is_decision():
      """[NP, T] f32: created by a chance outcome, or the root."""
      return jnp.where(
          jnp.logical_or(nact_ref[:] >= float(AD), nrow == 0.0), 1.0, 0.0)

    def decode_support(logits_):
      p = jax.nn.softmax(logits_, axis=0)
      idx = (jax.lax.broadcasted_iota(jnp.int32, (S41, T), 0)
             .astype(jnp.float32))
      bins = idx - float(support_size)
      return _inv_value_transform(
          jnp.sum(p * bins, axis=0, keepdims=True))

    def run_tower(x, layers, first_split=None):
      for i, (w, b) in enumerate(layers):
        if i == 0 and first_split is not None:
          emb_x, a_x = first_split
          h = matTx(w[:E], emb_x) + matTx(w[E:], a_x) + b
        else:
          h = matTx(w, x) + b
        x = _elu(h)
      return x

    def _stoch_score(cur, depth):
      node_oh = nrow == cur
      rowmask = row_n == cur
      fdec = gather_np(node_is_decision(), node_oh)     # [1, T]
      nvisit = gather_np(nvis_ref, node_oh)
      nvalue = gather_np(nval_ref, node_oh)
      cvis = cvis_ref[:]
      # Decision branch: MuZero PUCT + parent-and-siblings qtransform with
      # the per-slot edge discount (decision edges: r=0, gamma=1).
      q = crew_ref[:] + gamma_cp * cval_ref[:]
      visited = cvis > 0.0
      safe_q = jnp.where(visited, q, nvalue)
      minq = jnp.min(jnp.where(rowmask, safe_q, _NEG * -1.0), axis=0,
                     keepdims=True)
      maxq = jnp.max(jnp.where(rowmask, safe_q, _NEG), axis=0,
                     keepdims=True)
      minv = jnp.minimum(nvalue, minq)
      maxv = jnp.maximum(nvalue, maxq)
      completed = jnp.where(visited, q, minv)
      qn = (completed - minv) / jnp.maximum(maxv - minv, 1e-8)
      pb_c = pb_c_init + jnp.log((nvisit + pb_c_base + 1.0) / pb_c_base)
      dec_score = qn + (jnp.sqrt(nvisit) * pb_c) * cpri_ref[:] / (cvis + 1.0)
      # Chance branch: prior-proportional visit tracking
      # (_stochastic_interior_selection chance_score; the full-row visit
      # sum equals the chance-slot sum because decision slots of a chance
      # node are never visited).
      sum_vis = jnp.sum(jnp.where(rowmask, cvis, 0.0), axis=0,
                        keepdims=True)
      ch_score = cpri_ref[:] - cvis / (1.0 + sum_vis)
      score = jnp.where(fdec > 0.0, dec_score, ch_score)
      # Only the parent-type-matching slot span is selectable.
      valid = dec_slot == jnp.broadcast_to(fdec, (CP, T))
      score = jnp.where(valid, score, _NEG)
      score = jnp.where(
          jnp.logical_and(depth == 0, invalid_cp > 0.0), _NEG, score)
      return jnp.where(rowmask, score, _NEG)

    def _select(score):
      m = jnp.max(score, axis=0, keepdims=True)
      best = jnp.min(jnp.where(score >= m, crow, 3e7), axis=0,
                     keepdims=True)
      a = best - jnp.floor(best / AP) * AP
      child = jnp.sum(jnp.where(crow == best, cidx_ref[:], 0.0), axis=0,
                      keepdims=True)
      return best, a, child

    def sim_body(s, _):
      def d_cond(c):
        return jnp.any(c[4] > 0.0)

      def d_body(c):
        cur, parent, act, depth, active = c
        score = _stoch_score(cur, depth)
        _, a, child = _select(score)
        on = active > 0.0
        parent = jnp.where(on, cur, parent)
        act = jnp.where(on, a, act)
        cur = jnp.where(on, child, cur)
        depth = depth + 1
        still = jnp.where(depth < max_depth, 1.0, 0.0)
        active = active * jnp.where(child == -1.0, 0.0, 1.0) * still
        return cur, parent, act, depth, active

      init = (zero_r, zero_r - 1.0, zero_r - 1.0,
              jnp.asarray(0, jnp.int32), zero_r + 1.0)
      cur, parent, act, _, _ = jax.lax.while_loop(d_cond, d_body, init)

      edge = parent * AP + act
      edge_mask = crow == edge
      existing = jnp.sum(jnp.where(edge_mask, cidx_ref[:], 0.0), axis=0,
                         keepdims=True)
      slot = jnp.where(existing < 0.0, (s + 1).astype(jnp.float32),
                       existing)

      # ---- expand: all three interior towers, blended by parent type ----
      parent_oh = nrow == parent
      f = gather_np(node_is_decision(), parent_oh)       # [1, T]
      emb = jnp.concatenate(
          [jnp.sum(jnp.where(parent_oh, emb_ref[e], 0.0), axis=0,
                   keepdims=True) for e in range(E)], axis=0)

      a_dec = (jax.lax.broadcasted_iota(jnp.int32, (AD, T), 0)
               .astype(jnp.float32) == act).astype(jnp.float32)
      o_oh = (jax.lax.broadcasted_iota(jnp.int32, (C, T), 0)
              .astype(jnp.float32) == act - float(AD)).astype(jnp.float32)

      h_d = run_tower(None, dec_hidden, first_split=(emb, a_dec))
      after_pre = matTx(dec_state[0], h_d) + dec_state[1]
      mn = jnp.min(after_pre, axis=0, keepdims=True)
      mx = jnp.max(after_pre, axis=0, keepdims=True)
      afterstate = (after_pre - mn) / jnp.maximum(mx - mn, 1e-8)
      chance_logits = matTx(dec_chance[0], h_d) + dec_chance[1]
      av = decode_support(matTx(dec_value[0], h_d) + dec_value[1])

      h_c = run_tower(None, ch_hidden, first_split=(emb, o_oh))
      ns_pre = matTx(ch_state[0], h_c) + ch_state[1]
      mn2 = jnp.min(ns_pre, axis=0, keepdims=True)
      mx2 = jnp.max(ns_pre, axis=0, keepdims=True)
      ns = (ns_pre - mn2) / jnp.maximum(mx2 - mn2, 1e-8)
      reward_c = decode_support(matTx(ch_reward[0], h_c) + ch_reward[1])

      h_p = run_tower(ns, pred_hidden)
      pol = matTx(pred_policy[0], h_p) + pred_policy[1]
      val_c = decode_support(matTx(pred_value[0], h_p) + pred_value[1])

      value = f * av + (1.0 - f) * val_c
      reward = (1.0 - f) * reward_c
      new_emb = [f * afterstate[e:e + 1, :] + (1.0 - f) * ns[e:e + 1, :]
                 for e in range(E)]
      pri_new = jnp.concatenate(
          [jax.nn.softmax(pol, axis=0) * (1.0 - f),
           jax.nn.softmax(chance_logits, axis=0) * f], axis=0)  # [AP, T]

      # ---- install (update_tree_node running-mean semantics) ----
      slot_oh = nrow == slot
      count = gather_np(nvis_ref, slot_oh)
      oldv = gather_np(nval_ref, slot_oh)
      blended = (oldv * count + value) / (count + 1.0)
      nvis_ref[:] = nvis_ref[:] + jnp.where(slot_oh, 1.0, 0.0)
      nval_ref[:] = jnp.where(slot_oh, blended, nval_ref[:])
      nraw_ref[:] = jnp.where(slot_oh, value, nraw_ref[:])
      npar_ref[:] = jnp.where(slot_oh, parent, npar_ref[:])
      nact_ref[:] = jnp.where(slot_oh, act, nact_ref[:])
      slot_rows = row_n == slot
      cpri_ref[:] = jnp.where(slot_rows, jnp.tile(pri_new, (NP, 1)),
                              cpri_ref[:])
      crew_ref[:] = jnp.where(edge_mask, reward, crew_ref[:])
      cidx_ref[:] = jnp.where(edge_mask, slot, cidx_ref[:])
      for e in range(E):
        emb_ref[e] = jnp.where(slot_oh, new_emb[e], emb_ref[e])

      # ---- backup with the per-edge discount ----
      def b_cond(c):
        return jnp.any(c[0] != 0.0)

      def b_body(c):
        idx, v = c
        activeb = jnp.where(idx != 0.0, 1.0, 0.0)
        idx_oh = nrow == idx
        par = jnp.sum(jnp.where(idx_oh, npar_ref[:], 0.0), axis=0,
                      keepdims=True)
        a_b = jnp.sum(jnp.where(idx_oh, nact_ref[:], 0.0), axis=0,
                      keepdims=True)
        par_oh = nrow == par
        cnt = gather_np(nvis_ref, par_oh)
        em = crow == (par * AP + a_b)
        r = jnp.sum(jnp.where(em, crew_ref[:], 0.0), axis=0, keepdims=True)
        gb = jnp.sum(jnp.where(em, gamma_cp, 0.0), axis=0, keepdims=True)
        vnew = r + gb * v
        pval = (gather_np(nval_ref, par_oh) * cnt + vnew) / (cnt + 1.0)
        child_val = gather_np(nval_ref, idx_oh)
        wm_np = jnp.where(par_oh, activeb, 0.0) > 0.0
        nval_ref[:] = jnp.where(wm_np, pval, nval_ref[:])
        nvis_ref[:] = nvis_ref[:] + jnp.where(wm_np, 1.0, 0.0)
        wm_cp = jnp.where(em, activeb, 0.0) > 0.0
        cval_ref[:] = jnp.where(wm_cp, child_val, cval_ref[:])
        cvis_ref[:] = cvis_ref[:] + jnp.where(wm_cp, 1.0, 0.0)
        on = activeb > 0.0
        v = jnp.where(on, vnew, v)
        idx = jnp.where(on, par, idx)
        return idx, v

      jax.lax.while_loop(b_cond, b_body, (slot, value))
      return 0

    jax.lax.fori_loop(0, num_simulations, sim_body, 0)

    out_visits_ref[:] = cvis_ref[:AD, :]
    out_value_ref[:] = nval_ref[:1, :]
    # Decision-edge q = child (afterstate) value: r=0, gamma=1.
    out_q_ref[:] = cval_ref[:AD, :]

  return kernel


def fused_smz_search(
    root_embedding: jax.Array,      # [B, E]
    root_prior_logits: jax.Array,   # [B, A] decision logits (noised/masked)
    root_value: jax.Array,          # [B]
    weights: FusedSMZWeights,
    *,
    num_simulations: int,
    num_chance_outcomes: int,
    support_size: int,
    discount: float,
    invalid_actions: Optional[jax.Array] = None,
    max_depth: Optional[int] = None,
    pb_c_init: float = 1.25,
    pb_c_base: float = 19652.0,
    batch_tile: Optional[int] = None,
    interpret: Optional[bool] = None,
):
  """Run the fused stochastic search. Returns (decision visit_counts
  [B, A] f32, root_value [B], decision q [B, A])."""
  B, E = root_embedding.shape
  AD = root_prior_logits.shape[-1]
  C = num_chance_outcomes
  AP = AD + C
  S41 = 2 * support_size + 1
  NP = _round_up(num_simulations + 1, 8)
  if max_depth is None:
    max_depth = num_simulations
  if invalid_actions is None:
    invalid_actions = jnp.zeros((B, AD), jnp.float32)
  if interpret is None:
    interpret = jax.default_backend() == "cpu"

  bytes_per_env = 4 * (5 * NP + 5 * NP * AP + E * NP)
  T = batch_tile or _pick_tile(B, bytes_per_env)
  G = -(-B // T)
  BP = G * T

  # Extended root: chance slots masked out of the prior and invalid.
  pad_c = jnp.full((B, C), _NEG, jnp.float32)
  ext_logits = jnp.concatenate(
      [root_prior_logits.astype(jnp.float32), pad_c], -1)
  ext_invalid = jnp.concatenate(
      [invalid_actions.astype(jnp.float32), jnp.ones((B, C), jnp.float32)],
      -1)

  inputs = [root_embedding.astype(jnp.float32).T, ext_logits.T,
            root_value.astype(jnp.float32)[None, :], ext_invalid.T]
  if BP != B:
    inputs = [jnp.pad(x, ((0, 0), (0, BP - B))) for x in inputs]

  wlist = []

  def flat(pair):
    w, b = pair
    wlist.append(jnp.asarray(w, jnp.float32))
    wlist.append(jnp.reshape(jnp.asarray(b, jnp.float32), (-1, 1)))

  for pair in weights.dec_layers:
    flat(pair)
  flat(weights.dec_state)
  flat(weights.dec_chance)
  flat(weights.dec_value)
  for pair in weights.ch_layers:
    flat(pair)
  flat(weights.ch_state)
  flat(weights.ch_reward)
  for pair in weights.pred_layers:
    flat(pair)
  flat(weights.pred_policy)
  flat(weights.pred_value)

  kernel = _make_smz_kernel(
      T=T, NP=NP, AD=AD, C=C, E=E, S41=S41,
      n_dec_hidden=len(weights.dec_layers),
      n_ch_hidden=len(weights.ch_layers),
      n_pred_hidden=len(weights.pred_layers),
      num_simulations=num_simulations, max_depth=max_depth,
      discount=discount, pb_c_init=pb_c_init, pb_c_base=pb_c_base,
      support_size=support_size)

  def col_spec(rows):
    return pl.BlockSpec((rows, T), lambda i: (0, i),
                        memory_space=pltpu.VMEM)

  def const_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)

  in_specs = [col_spec(E), col_spec(AP), col_spec(1), col_spec(AP)]
  in_specs += [const_spec(w.shape) for w in wlist]

  visits, value, qvalues = pl.pallas_call(
      kernel,
      grid=(G,),
      in_specs=in_specs,
      out_specs=(col_spec(AD), col_spec(1), col_spec(AD)),
      out_shape=(
          jax.ShapeDtypeStruct((AD, BP), jnp.float32),
          jax.ShapeDtypeStruct((1, BP), jnp.float32),
          jax.ShapeDtypeStruct((AD, BP), jnp.float32),
      ),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      scratch_shapes=[
          pltpu.VMEM((NP, T), jnp.float32),       # node visits
          pltpu.VMEM((NP, T), jnp.float32),       # node values
          pltpu.VMEM((NP, T), jnp.float32),       # node raw values
          pltpu.VMEM((NP, T), jnp.float32),       # parents
          pltpu.VMEM((NP, T), jnp.float32),       # creating action
          pltpu.VMEM((NP * AP, T), jnp.float32),  # children index
          pltpu.VMEM((NP * AP, T), jnp.float32),  # children priors
          pltpu.VMEM((NP * AP, T), jnp.float32),  # children visits
          pltpu.VMEM((NP * AP, T), jnp.float32),  # children rewards
          pltpu.VMEM((NP * AP, T), jnp.float32),  # children values
          pltpu.VMEM((E, NP, T), jnp.float32),    # embeddings
      ],
      interpret=interpret,
  )(*inputs, *wlist)

  return visits[:, :B].T, value[0, :B], qvalues[:, :B].T


def fused_smz_policy(
    params: Any,
    rng: jax.Array,
    root,                      # RootFnOutput (decision root)
    weights: FusedSMZWeights,
    *,
    num_simulations: int,
    num_chance_outcomes: int,
    support_size: int,
    discount: float,
    invalid_actions: Optional[jax.Array] = None,
    max_depth: Optional[int] = None,
    dirichlet_fraction: float = 0.25,
    dirichlet_alpha: float = 0.3,
    pb_c_init: float = 1.25,
    pb_c_base: float = 19652.0,
    temperature=1.0,
    batch_tile: Optional[int] = None,
):
  """Drop-in for ``policies.stochastic_muzero_policy`` on the fused path:
  same root noising, same decision-slot visit-probs output."""
  del params
  from muax_tpu.search.policies import (_add_dirichlet_noise,
                                        _apply_temperature,
                                        _get_logits_from_probs,
                                        _mask_invalid)
  rng, noise_rng, _search_rng, sample_rng = jax.random.split(rng, 4)
  probs = jax.nn.softmax(root.prior_logits, axis=-1)
  probs = _add_dirichlet_noise(noise_rng, probs, fraction=dirichlet_fraction,
                               alpha=dirichlet_alpha)
  noised_logits = _get_logits_from_probs(probs)
  noised_logits = _mask_invalid(noised_logits, invalid_actions)

  visit_counts, root_value, _ = fused_smz_search(
      root.embedding, noised_logits, root.value, weights,
      num_simulations=num_simulations,
      num_chance_outcomes=num_chance_outcomes, support_size=support_size,
      discount=discount, invalid_actions=invalid_actions,
      max_depth=max_depth, pb_c_init=pb_c_init, pb_c_base=pb_c_base,
      batch_tile=batch_tile)

  total = jnp.sum(visit_counts, axis=-1, keepdims=True)
  action_weights = jnp.where(
      total > 0, visit_counts / jnp.maximum(total, 1.0),
      1.0 / visit_counts.shape[-1])
  action_logits = _apply_temperature(
      _get_logits_from_probs(action_weights), temperature)
  action = jax.random.categorical(sample_rng, action_logits).astype(jnp.int32)
  return action, action_weights, root_value
