"""Tracing / profiling + debug instrumentation (SURVEY.md §5).

- ``trace(...)``: context manager around ``jax.profiler`` producing a
  Perfetto-compatible trace directory.
- ``debug_mode(...)``: enables NaN checking (``jax_debug_nans``) — the
  on-device analogue of a sanitizer for samplers (a NaN in the hot loop
  raises at the op that produced it instead of silently propagating
  through masked blends).
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mjhmc_trace"):
    """Profile everything inside the block; view with Perfetto/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_mode(nans: bool = True, disable_jit: bool = False):
    """Debug context: raise on NaN production; optionally run eagerly."""
    ctx = contextlib.ExitStack()
    with ctx:
        if nans:
            ctx.enter_context(jax.debug_nans(True))
        if disable_jit:
            ctx.enter_context(jax.disable_jit())
        yield
