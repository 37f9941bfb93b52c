"""Profiling helpers (SURVEY.md §5 "Tracing / profiling").

Thin wrappers over the JAX profiler (Perfetto/XProf traces) plus a rays/s
timing harness with the measurement protocol this environment needs: the
timed function must return small on-device reductions, and completion is
forced by materializing those scalars (block_until_ready does not reliably
fence through tunneled TPU backends; pulling full images times the host
transfer instead of the kernel).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/raymarch_tpu_trace"):
    """Capture a device trace viewable in Perfetto / XProf:
    with profiling.trace("/tmp/t"): render(...)"""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, warmup: int = 2, iters: int = 5) -> float:
    """Best-of-iters wall time of `fn(*args)` with scalar-forcing; returns
    seconds per call."""
    import jax

    def force(out):
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf).ravel()[:1]

    for _ in range(warmup):
        force(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def rays_per_second(fn: Callable, n_rays: int, *args, **kw) -> float:
    return n_rays / time_fn(fn, *args, **kw)
