"""Profiling utilities — the TPU analogue of the reference's CUDA-event
timing + thop accounting (SURVEY.md §5.1): jax.profiler trace capture plus
the fetch-synced timing in eval/analysis.py."""

from __future__ import annotations

from contextlib import contextmanager
from pathlib import Path


@contextmanager
def trace(log_dir="/tmp/virnet_tpu_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto:

        with trace("/tmp/tb"):
            np.asarray(forward(params, x))
    """
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
