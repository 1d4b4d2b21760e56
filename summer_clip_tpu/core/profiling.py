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

__all__ = ["trace", "timed", "absorb_first_fetch_stall"]


def absorb_first_fetch_stall(log: tp.Optional[tp.Callable[[str], None]] = None
                             ) -> float:
    """Pay the tunnel's first VALUE FETCH before any measurement clock runs.

    On the tunneled-TPU host the first fetch in a fresh process
    intermittently stalls 680-820s at the transport layer (caught live:
    820.8s warmup, then the "stalled" program re-timed at 1.4s —
    docs/KERNELS.md "Addendum — the third confound"). Call this once at
    tool startup; returns the absorbed seconds and reports via ``log``
    when it exceeds 5s. No-op-cheap (~ms) when the transport is healthy.
    """
    import jax.numpy as jnp

    t0 = time.perf_counter()
    assert float(jnp.asarray(1.0) + jnp.asarray(1.0)) == 2.0
    dt = time.perf_counter() - t0
    if dt > 5.0 and log is not None:
        log(f"[warmup] first-fetch absorbed a {dt:.1f}s transport stall")
    return dt


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
