"""Cross-cutting utilities: profiling, timing, numerics sanitizers."""

from muax_tpu.utils.debug import (
    assert_finite,
    check_numerics,
    nan_guard,
    set_check_numerics,
)
from muax_tpu.utils.profiling import Stopwatch, step_annotation, trace
