"""Batched on-device tree search engine (the framework's mctx-equivalent)."""

from muax_tpu.search.types import (
    RootFnOutput,
    RecurrentFnOutput,
    DecisionRecurrentFnOutput,
    ChanceRecurrentFnOutput,
    StochasticRecurrentState,
    PolicyOutput,
)
from muax_tpu.search.tree import Tree, SearchSummary, ROOT_INDEX
from muax_tpu.search.core import search
from muax_tpu.search.policies import (
    muzero_policy,
    gumbel_muzero_policy,
    stochastic_muzero_policy,
)
from muax_tpu.search.sampled_policy import (
    ContinuousRecurrentFnOutput,
    SampledPolicyOutput,
    SampledRecurrentState,
    make_factored_bin_sample_fn,
    make_gaussian_sample_fn,
    sampled_muzero_policy,
)
from muax_tpu.search import qtransforms
from muax_tpu.search import seq_halving
from muax_tpu.search import action_selection
