"""Profiling / timing helpers (SURVEY.md §5 'Tracing': reference has none;
the build's observability surface is jax.profiler traces + sweep timing).
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_sweeps(run_fn, graph, state, cfg, n_iters: int, warmup: int = 5):
    """Measure steady-state sweeps/s of a compiled run function.

    run_fn: e.g. jax.jit(run, static_argnums=3).  Returns (sweeps_per_s,
    final_state).  Warmup triggers compilation so the timed region measures
    execution only.
    """
    state = run_fn(graph, state, cfg, warmup)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    state = run_fn(graph, state, cfg, n_iters)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    return n_iters / dt, state
