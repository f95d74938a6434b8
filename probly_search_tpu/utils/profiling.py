"""Tracing / profiling.

The reference has no tracing (SURVEY §5).  New subsystem: phase-scoped wall
timers feeding the metrics registry, and a wrapper over the JAX profiler
that emits Perfetto-compatible traces of the device programs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

from .metrics import metrics


@contextlib.contextmanager
def phase(name: str) -> Iterator[None]:
    """Wall-clock a named phase (tokenize/plan/dispatch/drain/...)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        metrics.observe(f"phase/{name}", dt)


@contextlib.contextmanager
def device_trace(log_dir: str, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a JAX profiler trace (view with Perfetto / TensorBoard).

    Usage:
        with device_trace("/tmp/trace"):
            index.query_batch(...)
    """
    import jax

    with jax.profiler.trace(log_dir, create_perfetto_trace=True):
        yield


def annotate(name: str):
    """Decorator: time every call of fn into the metrics registry."""

    def deco(fn):
        def wrapped(*a, **kw):
            with phase(name):
                return fn(*a, **kw)

        wrapped.__name__ = getattr(fn, "__name__", name)
        return wrapped

    return deco
