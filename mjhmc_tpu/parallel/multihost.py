"""Multi-host initialization for pod-slice runs (SURVEY.md §5).

On a TPU pod slice each host runs the same program; ``initialize()`` wires
them into one JAX process group (``jax.distributed.initialize``), after
which ``jax.devices()`` spans the slice and the chain mesh covers every
chip — nothing else in the framework changes: state arrays are created
with global shapes + NamedShardings, GSPMD partitions the same HLO, and
the sampler hot loop remains collective-free.

This image has a single reachable chip, so the function is exercised here
only in its no-op single-process form; on a real slice it follows the
standard coordinator/num_processes/process_id contract (env-var driven by
the TPU runtime when arguments are omitted).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Join the multi-host process group; returns topology info.

    With no arguments, relies on TPU runtime environment discovery (the
    normal path on Cloud TPU pods). Explicit-arguments failures RAISE (on a
    real pod a genuine init failure must not be mistaken for single-process
    mode); only the argument-free env-discovery path degrades gracefully,
    and then the swallowed error is surfaced in ``info["error"]``.
    """
    info = {"initialized": False}
    try:
        if num_processes is not None and num_processes > 1:
            # explicit cluster spec: a failure here is a real failure
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
            info["initialized"] = True
        elif coordinator_address is None and num_processes is None:
            # env-discovery path; no-op off-pod, but keep the evidence
            try:
                jax.distributed.initialize()
                info["initialized"] = True
            except Exception as e:  # noqa: BLE001 — reported, not hidden
                info["error"] = f"{type(e).__name__}: {e}"
    finally:
        info.update(
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            local_devices=len(jax.local_devices()),
            global_devices=len(jax.devices()),
        )
    return info
