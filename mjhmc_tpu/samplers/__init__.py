"""Samplers: MJHMC core, control HMC, NUTS, algebraic ladder oracle."""

from mjhmc_tpu.samplers.state import (
    ChainState,
    MJState,
    HMCState,
    make_chain_state,
    make_mj_state,
    make_hmc_state,
)
from mjhmc_tpu.samplers.mjhmc import (
    MarkovJumpHMC,
    MJStepOut,
    MomentAccumulator,
    mjhmc_step,
    mjhmc_run,
)
from mjhmc_tpu.samplers.hmc import ControlHMC, HMCStepOut, hmc_step, hmc_run
from mjhmc_tpu.samplers.reduced_flip import (
    ReducedFlipHMC,
    RFStepOut,
    reduced_flip_hmc_step,
    reduced_flip_hmc_run,
)
from mjhmc_tpu.samplers.malt import MALT, MALTStepOut, malt_step, malt_run
from mjhmc_tpu.samplers.chees import (
    CheesState,
    chees_hmc_run,
    chees_hmc_step,
    chees_init,
)
from mjhmc_tpu.samplers.tempering import (
    ParallelTempering,
    PTState,
    PTStepOut,
    geometric_ladder,
    make_pt_state,
    pt_step,
    pt_run,
    update_ladder,
)
from mjhmc_tpu.samplers.nuts import (
    NUTS,
    NUTSState,
    NUTSStepOut,
    make_nuts_state,
    nuts_step,
    nuts_run,
)

__all__ = [
    "ChainState",
    "MJState",
    "HMCState",
    "make_chain_state",
    "make_mj_state",
    "make_hmc_state",
    "MarkovJumpHMC",
    "MJStepOut",
    "MomentAccumulator",
    "mjhmc_step",
    "mjhmc_run",
    "ControlHMC",
    "HMCStepOut",
    "hmc_step",
    "hmc_run",
    "ReducedFlipHMC",
    "RFStepOut",
    "reduced_flip_hmc_step",
    "reduced_flip_hmc_run",
    "MALT",
    "MALTStepOut",
    "malt_step",
    "malt_run",
    "NUTS",
    "NUTSState",
    "NUTSStepOut",
    "make_nuts_state",
    "nuts_step",
    "nuts_run",
    "CheesState",
    "chees_hmc_run",
    "chees_hmc_step",
    "chees_init",
    "ParallelTempering",
    "PTState",
    "PTStepOut",
    "geometric_ladder",
    "make_pt_state",
    "pt_step",
    "pt_run",
    "update_ladder",
]
