"""Benchmark timing helpers (SURVEY.md §5 "Tracing / profiling").

All timings call ``jax.block_until_ready`` so async dispatch can't fake
throughput; steps/sec and grad-evals/sec are first-class metrics.
"""

from __future__ import annotations

import time
from typing import Callable

import jax


class Timer:
    """Context manager: wall-clock with device sync on exit."""

    def __init__(self, sync_value=None):
        self._sync_value = sync_value
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync_value is not None:
            jax.block_until_ready(self._sync_value)
        self.elapsed = time.perf_counter() - self._t0
        return False


def steps_per_second(fn: Callable, *args, warmup: int = 1, iters: int = 3, **kw):
    """Time ``fn(*args, **kw)`` (which must return device values); returns
    (best_seconds, last_result). Warmup runs absorb compilation."""
    result = None
    for _ in range(warmup):
        result = jax.block_until_ready(fn(*args, **kw))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        result = jax.block_until_ready(fn(*args, **kw))
        best = min(best, time.perf_counter() - t0)
    return best, result
