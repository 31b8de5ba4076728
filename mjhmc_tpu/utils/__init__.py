"""Utilities: timing, checkpointing, burn-in caching."""

from mjhmc_tpu.utils.timing import Timer, steps_per_second

__all__ = ["Timer", "steps_per_second"]
