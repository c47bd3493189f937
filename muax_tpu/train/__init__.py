"""Jitted actor/learner and the end-to-end fit driver."""

from muax_tpu.train.actor import make_rollout_fn, make_policy_fn
from muax_tpu.train.learner import (
    TrainState,
    make_update_fn,
    make_multi_update_fn,
)
from muax_tpu.train.fit import fit, make_evaluate_fn
from muax_tpu.train.inference import make_root_fn, make_recurrent_fn
from muax_tpu.train.checkpoint import save_pytree, load_pytree
from muax_tpu.train import temperature
