"""Which fused Pallas fast paths will a given setup actually take, and why?

The fused kernels (search forest, replay sampler, learner) each have
trace-time applicability gates (network family, backend, ring size, batch
alignment). A config that silently steps off a fast path can cost 2x+
throughput with no error — this module turns those gates into one
inspectable report, logged once by ``fit`` (VERDICT r4 item 7).

  >>> from muax_tpu.fused_status import fused_status
  >>> report = fused_status(networks, config, params, replay_state)
  >>> report["fused_sampler"]
  {'active': False, 'reason': 'obs features 3200 > 64 (conv/pixel rings...'}
"""
from __future__ import annotations

from typing import Any, Optional

import jax


def _search_status(networks, config, params) -> dict:
  search = config.search
  if not getattr(search, "fused", False):
    return {"active": False, "reason": "disabled by config (search.fused)"}
  if jax.default_backend() == "cpu":
    return {"active": False,
            "reason": "CPU backend (generic XLA engine is faster there)"}
  if search.policy == "stochastic":
    if not hasattr(networks, "num_chance_outcomes"):
      return {"active": False,
              "reason": "stochastic policy over a non-SMZ network family"}
    from muax_tpu.search.fused import extract_smz_fused_weights
    if extract_smz_fused_weights(networks, params) is None:
      return {"active": False,
              "reason": "SMZ 5-net layout not extractable to the kernel"}
    return {"active": True, "reason": "SMZ decision/chance forest kernel"}
  if search.policy not in ("muzero", "gumbel"):
    return {"active": False,
            "reason": f"policy {search.policy!r} has no fused forest kernel"}
  if hasattr(networks, "support_size"):
    from muax_tpu.search.fused import extract_fused_weights
    w = extract_fused_weights(networks, params)
    kind = "MLP triplet"
  elif hasattr(networks, "num_bins"):
    from muax_tpu.search.fused import extract_categorical_fused_weights
    w = extract_categorical_fused_weights(networks, params)
    kind = "acme categorical"
  else:
    return {"active": False, "reason": "unrecognized network family"}
  if w is None:
    return {"active": False,
            "reason": f"{kind} weights not extractable "
                      "(conv/resnet towers stay on the XLA engine)"}
  return {"active": True, "reason": f"{kind} forest kernel"}


def _learner_status(networks, config, params) -> dict:
  tcfg = config.train
  if not tcfg.fused_learner:
    return {"active": False, "reason": "disabled by config (fused_learner)"}
  if hasattr(networks, "chance"):
    return {"active": False,
            "reason": "stochastic 5-net family has no learner kernel"}
  if jax.default_backend() == "cpu":
    return {"active": False,
            "reason": "CPU backend (jax.grad is faster than interpret mode)"}
  from muax_tpu.models.fused_learner import (
      extract_categorical_learner_spec, extract_learner_weights)
  lw = (extract_learner_weights(networks, params)
        or extract_categorical_learner_spec(networks, params))
  if lw is None:
    return {"active": False,
            "reason": "network family has no LearnerSpec (MLP + acme "
                      "LayerNormMLP only; fc-resnet/conv use jax.grad)"}
  return {"active": True, "reason": "loss+backward kernel"}


def fused_status(networks, config, params,
                 replay_state: Optional[Any] = None,
                 optimizer: Optional[Any] = None) -> dict:
  """Report {fused_search, fused_learner, fused_sampler} applicability.

  ``replay_state`` is required for the sampler entry (its gate depends on
  ring capacity/obs width); without it the entry reports indeterminate.
  The sampler check reuses the learner's OWN dispatch gate
  (make_multi_update_fn's ``fused_group_status`` seam), so this report
  cannot drift from what the learner actually does.
  """
  report = {
      "fused_search": _search_status(networks, config, params),
      "fused_learner": _learner_status(networks, config, params),
  }
  if replay_state is None:
    report["fused_sampler"] = {
        "active": False,
        "reason": "indeterminate: pass replay_state to evaluate the ring"}
  else:
    import optax

    from muax_tpu.train.learner import TrainState, make_multi_update_fn
    mu = make_multi_update_fn(networks, optimizer or optax.sgd(0.0), config)
    ts = TrainState(params=params, opt_state=(), step=0)
    mode, _, reason = mu.fused_group_status(ts, replay_state)
    report["fused_sampler"] = {"active": mode is not None,
                               "reason": reason}
  return report


def format_fused_status(report: dict) -> str:
  """One log line: 'fused: search=on learner=on sampler=OFF(<why>)'."""
  parts = []
  for key in ("fused_search", "fused_learner", "fused_sampler"):
    name = key.split("_", 1)[1]
    entry = report[key]
    if entry["active"]:
      parts.append(f"{name}=on")
    else:
      parts.append(f"{name}=OFF({entry['reason']})")
  return "fused: " + " ".join(parts)
