"""Diagnostics: weighted autocorrelation, ESS, split-R̂, spectral gaps
(SURVEY.md L4)."""

from mjhmc_tpu.diagnostics.autocorr import (
    weighted_autocorrelation,
    autocorrelation,
    effective_sample_size,
    autocorrelation_vs_grad_evals,
)
from mjhmc_tpu.diagnostics.rhat import potential_scale_reduction
from mjhmc_tpu.diagnostics.spectral import (
    spectral_gap_discrete,
    spectral_gap_continuous,
    empirical_spectral_gap,
)

__all__ = [
    "empirical_spectral_gap",
    "weighted_autocorrelation",
    "autocorrelation",
    "effective_sample_size",
    "autocorrelation_vs_grad_evals",
    "potential_scale_reduction",
    "spectral_gap_discrete",
    "spectral_gap_continuous",
]
