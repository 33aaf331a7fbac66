"""Tracing / profiling utilities — the observability layer (SURVEY §5).

The reference has no profiling at all (only wall-clock sleeps for GUI
pacing, utils/camera.py:64-82). Here:

  * ``trace(dir)`` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable device trace of everything run inside it.
  * ``time_fn`` — robust wall-clock timing of a jitted callable
    (compile excluded, block_until_ready included).
  * ``solve_throughput`` — the solves/s counter used by bench.py-style
    harnesses.
  * ``annotate`` — named ``TraceAnnotation`` scope so solver phases
    (linearize / backward / line-search) are labeled in device traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a region in the device trace (nested scopes supported)."""
    return jax.profiler.TraceAnnotation(name)


def time_fn(fn: Callable, *args, warmup: int = 1, iters: int = 3) -> float:
    """Mean wall seconds per call of fn(*args), post-compile."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters


def solve_throughput(solve_fn: Callable, batch: int, *args,
                     iters: int = 3) -> dict:
    """Solves/s of a batched solve callable (the bench.py metric)."""
    dt = time_fn(solve_fn, *args, iters=iters)
    return {"batch": batch, "seconds_per_batch": dt,
            "solves_per_second": batch / dt}
