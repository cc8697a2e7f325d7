"""Profiling hooks: jax.profiler traces gated by an env var.

The reference's only tracing is wall-clock spans in MonitoredRecommender
(SURVEY.md §5). The TPU-native equivalent keeps that per-stage timing contract
AND can capture real device traces: set ``ITOR_PROFILE_DIR`` and wrap hot
sections with :func:`maybe_trace` — TensorBoard-compatible traces land in the
directory; without the env var the context manager is free.
"""

from __future__ import annotations

import contextlib
import os

ENV_PROFILE_DIR = "ITOR_PROFILE_DIR"


@contextlib.contextmanager
def maybe_trace(name: str):
    """Trace the enclosed block with jax.profiler when profiling is enabled."""
    profile_dir = os.getenv(ENV_PROFILE_DIR)
    if not profile_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(profile_dir, name)):
        yield


def annotate(name: str):
    """TraceAnnotation for fine-grained spans inside an active trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)
