"""Compute kernels: leapfrog integrator, fused energy ops (SURVEY.md L0/L2)."""

from mjhmc_tpu.ops.leapfrog import leapfrog, kinetic_energy, total_energy

__all__ = ["leapfrog", "kinetic_energy", "total_energy"]
