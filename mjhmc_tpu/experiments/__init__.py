"""Experiment drivers + paper-figure reproduction (SURVEY.md §2.7, L5)."""

from mjhmc_tpu.experiments.autocorr_experiment import calculate_autocorrelation

__all__ = ["calculate_autocorrelation"]
