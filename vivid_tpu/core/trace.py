"""Profiling helpers (aux subsystem: tracing, SURVEY.md §5.1).

Wraps jax.profiler for per-phase traces viewable in TensorBoard/Perfetto:

    from vivid_tpu.core.trace import trace
    with trace("/tmp/traces", enabled=True):
        state, _ = step_fn(state, batch, rng)

plus a simple wall-clock phase timer that reports into the stats stream
(the reference's sec/tick / sec/kimg / maintenance accounting).
"""

import contextlib
import time
from typing import Optional

import jax

from vivid_tpu.core import stats as stats_mod


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def phase_timer(name: str, stats: Optional[stats_mod.Stats] = None):
    """Times a host-side phase and reports 'Timing/<name>_sec'."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        (stats or stats_mod.default_stats).report(
            f"Timing/{name}_sec", time.perf_counter() - t0)


def annotate(name: str):
    """Decorator: device-trace annotation (shows up in profiler timelines)."""
    def deco(fn):
        def wrapper(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)
        wrapper.__name__ = getattr(fn, "__name__", "fn")
        return wrapper
    return deco
