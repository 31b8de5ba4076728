"""mjhmc_tpu — a TPU-native sampling framework.

A from-scratch, TPU-first (JAX/XLA/Pallas/pjit) framework covering the
capability set of the reference research code ``rueberger/MJHMC`` (companion
code to *A Markov Jump Process for More Efficient Hamiltonian Monte Carlo*,
arXiv:1509.03808):

- Markov Jump HMC with the L/F/R exponential-clock transition operator
  (``mjhmc_tpu.samplers.mjhmc``)
- standard/control HMC and NUTS baselines (``samplers.hmc``, ``samplers.nuts``)
- the algebraic ladder samplers used as an exact finite-state oracle
  (``samplers.algebraic``)
- VI (ADVI) and SMC heads over the same differentiable log-density API
  (``mjhmc_tpu.inference``)
- the reference's benchmark distributions: anisotropic/ill-conditioned
  Gaussian, rough well, product-of-t, sparse-coding posterior
  (``mjhmc_tpu.models``)
- autocorrelation / ESS / spectral-gap diagnostics (``mjhmc_tpu.diagnostics``)
- chain-sharded multi-host runtime with dual-averaging adaptation and SMC
  resampling via collectives (``mjhmc_tpu.parallel``)

Design stance (see SURVEY.md §7): everything is pure functions + ``lax.scan``;
state lives in pytree carries; per-chain control flow is masked selects; the
canonical state layout is ``(ndims, nbatch)`` so the chain axis rides the
128-wide TPU vector lanes; cross-chain collectives appear only in diagnostics,
adaptation and SMC resampling — never in the per-step sampler hot path.

The reference mount was empty during the survey (see SURVEY.md provenance
notice), so docstrings cite SURVEY.md sections and the paper rather than
reference file:line pairs.
"""

__version__ = "0.1.0"

from mjhmc_tpu import models, ops, samplers, diagnostics, parallel, inference, utils
from mjhmc_tpu.config import (
    MJHMCConfig,
    ControlHMCConfig,
    NUTSConfig,
    BENCHMARK_CONFIGS,
)

__all__ = [
    "models",
    "ops",
    "samplers",
    "diagnostics",
    "parallel",
    "inference",
    "utils",
    "MJHMCConfig",
    "ControlHMCConfig",
    "NUTSConfig",
    "BENCHMARK_CONFIGS",
]
