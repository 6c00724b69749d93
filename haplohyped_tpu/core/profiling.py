"""Profiling hooks: jax.profiler traces + annotated phases.

Usage::

    from haplohyped_tpu.core.profiling import trace, annotate

    with trace("/tmp/hh_trace"):           # XLA/TPU trace -> TensorBoard
        with annotate("tokenize"):
            out = tokenize_lines(...)
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace context (no-op when log_dir is falsy)."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in profiler timelines."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
