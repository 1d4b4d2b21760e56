"""Profiling hooks: jax.profiler traces surfaced through the metric keys.

TPU-side counterpart of the reference's CUDA-event timers and commented
``kernprof`` hooks (SURVEY.md §5): a context manager that captures a
`jax.profiler` trace for a region (viewable in TensorBoard/Perfetto) and a
decorator that times jitted callables with an effects barrier.
"""

from __future__ import annotations

import contextlib
import functools
import time
import typing as tp

__all__ = ["trace", "timed"]


@contextlib.contextmanager
def trace(log_dir: str = "./jax_trace", enabled: bool = True):
    """Capture a jax.profiler trace for the enclosed region."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: tp.Callable, *, name: tp.Optional[str] = None,
          sink: tp.Optional[tp.Callable[[str, float], None]] = None) -> tp.Callable:
    """Wrap a callable; logs wall time (with XLA drain) per invocation."""
    label = name or getattr(fn, "__name__", "fn")

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        import jax

        jax.effects_barrier()
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.effects_barrier()
        dt = time.perf_counter() - t0
        if sink:
            sink(label, dt)
        return out

    return wrapper
