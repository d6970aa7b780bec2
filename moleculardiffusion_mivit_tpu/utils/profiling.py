"""Profiling hooks (the reference has none — SURVEY.md §5; its only timing
is wall-clock prints bracketing a run, trainModels.py:99/279)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def time_block(name: str, results: dict = None):
    """Wall-clock a block after blocking on outstanding device work."""
    (jax.device_put(0.0) + 0).block_until_ready()
    t0 = time.perf_counter()
    yield
    (jax.device_put(0.0) + 0).block_until_ready()
    dt = time.perf_counter() - t0
    if results is not None:
        results[name] = dt
    else:
        print(f"[time] {name}: {dt:.3f}s")
