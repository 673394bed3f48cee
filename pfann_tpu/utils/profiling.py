"""Tracing / profiling helpers.

The reference instruments with wall-clock logs aggregated by tools/stat.py
(simpleutils.Timing, SURVEY.md section 5); both are kept here, plus the
TPU-native path: a jax.profiler trace context whose output loads in
TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib
import os
import time

from pfann_tpu.utils.logging import get_logger


@contextlib.contextmanager
def stage_timer(name: str):
    """Logs '<name> N.NNNNNNs' in the format tools/stat.py aggregates."""
    t0 = time.time()
    yield
    get_logger().info("%s %.6fs", name, time.time() - t0)


@contextlib.contextmanager
def device_trace(log_dir: str = "profiles", enabled: bool = True):
    """jax.profiler trace around a region (XLA + TPU timeline)."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named region inside a trace (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
