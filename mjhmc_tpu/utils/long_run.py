"""Checkpointed long-running sampling (SURVEY.md §5 failure recovery).

Wraps any sampler-class instance (MarkovJumpHMC / ControlHMC / NUTS) with
periodic full-state checkpoints so a killed job resumes exactly where it
stopped — the carry *is* the state (docs/DESIGN.md §2), so resume is
bit-exact.
"""

from __future__ import annotations

import os

import jax

from mjhmc_tpu.utils.checkpoint import load_pytree, save_pytree


def run_with_checkpoints(
    sampler,
    total_steps: int,
    checkpoint_every: int,
    path: str,
    collect: str = "stats",
) -> dict:
    """Run ``total_steps`` in chunks, checkpointing sampler state + RNG key.

    On start, resumes from ``path`` if present. Returns bookkeeping info
    (steps run this invocation, resumed-from step).
    """
    meta_path = path + ".meta"
    start = 0
    if os.path.exists(path) and os.path.exists(meta_path):
        with open(meta_path) as f:
            start = int(f.read().strip())
        ckpt = {"state": sampler.state, "key": sampler._key}
        restored = load_pytree(path, ckpt)
        sampler.state = restored["state"]
        sampler._key = restored["key"]

    steps_run = 0
    step = start
    while step < total_steps:
        chunk = min(checkpoint_every, total_steps - step)
        sampler.state, _ = sampler._run(
            sampler.state, sampler._next_key(), chunk, collect
        )
        step += chunk
        steps_run += chunk
        save_pytree(path, {"state": sampler.state, "key": sampler._key})
        with open(meta_path, "w") as f:
            f.write(str(step))
    return {"resumed_from": start, "steps_run": steps_run, "final_step": step}
