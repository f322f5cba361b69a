"""Profiling/tracing helpers.

The reference has no tracer (wall-clock around loops with device syncs,
SURVEY.md §5.2); on TPU the right tools are jax.profiler traces and honest
step timing. The helpers here encapsulate the one environment gotcha: over
tunneled devices ``block_until_ready`` can return early, so timings must
synchronize via a scalar device->host fetch.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


def sync(value) -> float:
    """Force full device synchronization by fetching one scalar."""
    leaf = jax.tree_util.tree_leaves(value)[0]
    return float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Average seconds per call of a jitted function, honestly synced."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tcnn_tpu_trace"):
    """jax.profiler trace context (view with TensorBoard / xprof).

    Falls back to a no-op with a warning if the backend's profiler is
    unavailable (e.g. tunneled devices).
    """
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # pragma: no cover - backend dependent
        from .log import log_warning

        log_warning(f"jax.profiler unavailable ({e}); trace() is a no-op")
        started = False
    try:
        yield log_dir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
