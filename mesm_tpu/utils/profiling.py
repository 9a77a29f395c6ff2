"""Profiling / tracing.

The reference's only instrumentation is four wall-clock AverageMeters
(reference train.py:48-96). Those meters are kept as the public surface
(utils/meters.py); this module adds the TPU-native layer: jax.profiler traces
(viewable in XProf/TensorBoard) and named step annotations.

Enable with MESM_TPU_PROFILE_DIR=/path or profile_dir= in the helpers.
"""
from __future__ import annotations

import contextlib
import os
from typing import Optional

import jax

_ENV = "MESM_TPU_PROFILE_DIR"


@contextlib.contextmanager
def maybe_trace(profile_dir: Optional[str] = None):
    """Capture a jax.profiler trace for the enclosed block when enabled."""
    profile_dir = profile_dir or os.environ.get(_ENV)
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_annotation(name: str):
    """Named annotation that shows up on the trace timeline."""
    return jax.profiler.StepTraceAnnotation(name)


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)
