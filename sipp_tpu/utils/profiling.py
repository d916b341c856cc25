"""Timing/tracing harness (SURVEY.md §5: replaces the reference's
Instant::now prints with structured timing + optional jax.profiler traces)."""

import contextlib
import json
import sys
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, reps: int = 3, warmup: int = 1, label: str = None):
    """Steady-state wall time of a jitted fn: returns seconds per call."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    if label:
        print(json.dumps({"label": label, "sec_per_call": dt}), file=sys.stderr)
    return dt
