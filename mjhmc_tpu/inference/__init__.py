"""VI and SMC heads over the shared log-density API (SURVEY.md §2.9)."""

from mjhmc_tpu.inference.vi import ADVI, ADVIParams, advi_fit, elbo, sample_q
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
    "advi_fit",
    "elbo",
    "sample_q",
    "SMC",
    "SMCState",
    "smc_run",
    "smc_stage",
    "systematic_resample",
]
