"""VI and SMC heads over the shared log-density API (SURVEY.md §2.9)."""

from mjhmc_tpu.inference.vi import (
    ADVI,
    ADVIParams,
    LowRankADVIParams,
    advi_fit,
    elbo,
    elbo_lowrank,
    q_covariance,
    sample_q,
    sample_q_lowrank,
)
from mjhmc_tpu.inference.smc import (
    SMC,
    SMCState,
    smc_run,
    smc_stage,
    systematic_resample,
)

__all__ = [
    "ADVI",
    "ADVIParams",
    "LowRankADVIParams",
    "advi_fit",
    "elbo",
    "elbo_lowrank",
    "q_covariance",
    "sample_q",
    "sample_q_lowrank",
    "SMC",
    "SMCState",
    "smc_run",
    "smc_stage",
    "systematic_resample",
]
