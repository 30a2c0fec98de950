"""Profiling and tracing hooks.

The reference has no tracing (SURVEY.md §5 — tqdm bars and a
CUDA_LAUNCH_BLOCKING note are the closest artifacts). Here: a
``jax.profiler`` trace context for the hot loops (feature extraction,
training steps), plus lightweight wall-clock stage timing via
``logging_utils.Timer``.
"""

from __future__ import annotations

import contextlib
import os

from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    Timer,
    get_logger,
)

log = get_logger("utils.profiling")


@contextlib.contextmanager
def trace(log_dir: str = "logs/profile", enabled: bool = True):
    """Capture a jax.profiler trace (viewable in TensorBoard / Perfetto)
    around a code region::

        with trace("logs/profile"):
            run_feature_extraction(...)
    """
    if not enabled:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    log.info("capturing jax.profiler trace into %s", log_dir)
    with jax.profiler.trace(log_dir):
        yield
    log.info("trace written to %s", log_dir)


def annotate(name: str):
    """Named sub-span inside an active trace (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


__all__ = ["trace", "annotate", "Timer"]
