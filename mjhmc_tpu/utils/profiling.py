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


#: XLA op-name prefixes that are cross-device communication
_COLLECTIVE_PREFIXES = (
    "all-reduce",
    "all-gather",
    "all-to-all",
    "reduce-scatter",
    "collective-permute",
    "collective-broadcast",
    "psum",
    "fusion.all-reduce",
)


def parse_trace_collectives(log_dir: str) -> dict:
    """Profile-derived communication accounting from a ``trace(...)`` dir.

    Scans the newest ``*.trace.json(.gz)`` under ``log_dir`` (the format
    ``jax.profiler`` writes) and sums event durations whose op names are
    XLA collectives. Returns ``{total_us, collective_us, fraction,
    by_op}`` — the one-command evidence for the ≥90% scaling claim
    (BASELINE.json: scaling efficiency is bounded by 1 − collective
    fraction when compute is perfectly data-parallel).
    """
    import glob
    import gzip
    import json as _json
    import os

    paths = sorted(
        glob.glob(os.path.join(log_dir, "**", "*.trace.json*"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        return {"total_us": 0.0, "collective_us": 0.0, "fraction": 0.0,
                "by_op": {}, "trace": None}
    path = paths[-1]
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        trace = _json.load(f)
    total = 0.0
    coll = 0.0
    by_op: dict[str, float] = {}
    for ev in trace.get("traceEvents", []):
        dur = ev.get("dur")
        if dur is None or ev.get("ph") != "X":
            continue
        name = str(ev.get("name", "")).lower()
        total += dur
        for p in _COLLECTIVE_PREFIXES:
            if p in name:
                coll += dur
                by_op[name] = by_op.get(name, 0.0) + dur
                break
    return {
        "total_us": total,
        "collective_us": coll,
        "fraction": (coll / total) if total else 0.0,
        "by_op": dict(sorted(by_op.items(), key=lambda kv: -kv[1])[:10]),
        "trace": path,
    }
