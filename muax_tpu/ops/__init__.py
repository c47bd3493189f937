"""Numerics kernels: value-support transforms, returns, gradient utilities."""

from muax_tpu.ops.support import (
    value_transform,
    inv_value_transform,
    scalar_to_support,
    support_to_scalar,
    logits_to_scalar,
    scalar_to_two_hot,
    two_hot_to_scalar,
    two_hot_logits_to_scalar,
)
from muax_tpu.ops.returns import (
    n_step_bootstrapped_returns,
    batched_n_step_returns,
    segment_n_step_returns,
)
from muax_tpu.ops.gradients import scale_gradient, clip_gradient
from muax_tpu.ops.normalize import min_max_normalize, min_max_normalize2d
from muax_tpu.ops.frames import diff_transform, diff_transform_matrix, action2plane
from muax_tpu.ops.augmentations import (
    drq_augmentation,
    random_intensity,
    random_shift,
)
