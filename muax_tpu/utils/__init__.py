"""Cross-cutting utilities: profiling, timing."""

from muax_tpu.utils.profiling import Stopwatch, step_annotation, trace
