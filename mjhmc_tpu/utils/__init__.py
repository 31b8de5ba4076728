"""Utilities: timing, checkpointing, burn-in caching."""

from mjhmc_tpu.utils.timing import Timer, steps_per_second
from mjhmc_tpu.utils.checkpoint import save_pytree, load_pytree
from mjhmc_tpu.utils.init_cache import burned_in_init

__all__ = [
    "Timer",
    "steps_per_second",
    "save_pytree",
    "load_pytree",
    "burned_in_init",
]
