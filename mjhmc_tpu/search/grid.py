"""Grid sweep over sampler hyperparameters.

The reference drove Spearmint (an external Bayesian-opt process) over
(ε, β, M) with the autocorrelation decay time as objective (SURVEY.md
§2.8/§3.5). Dual averaging (samplers.adaptation) replaces it for ε online;
this module provides the offline sweep for (ε, β, M) jointly: one jitted
run is compiled once with (ε, β) as *traced* scalars, then evaluated over
the whole grid with zero recompilation — the TPU-friendly version of a
hyperparameter search loop. (M is a static trajectory length, so each M
value compiles once.)
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.diagnostics import weighted_autocorrelation
from mjhmc_tpu.experiments.autocorr_experiment import _decay_time
from mjhmc_tpu.models.base import Distribution
from mjhmc_tpu.samplers import make_hmc_state, make_mj_state
from mjhmc_tpu.samplers.hmc import hmc_run
from mjhmc_tpu.samplers.mjhmc import mjhmc_run


@dataclasses.dataclass
class SearchResult:
    best: dict
    table: list  # [{epsilon, beta, num_leapfrog_steps, decay_evals}, ...]


def grid_search(
    dist: Distribution,
    sampler: str = "mjhmc",
    eps_grid: Sequence[float] = (0.1, 0.3, 1.0),
    beta_grid: Sequence[float] = (0.05, 0.2, 0.5),
    m_grid: Sequence[int] = (5,),
    num_steps: int = 800,
    nbatch: int = 256,
    nlags: int = 100,
    seed: int = 0,
    integrator: str = "leapfrog",
) -> SearchResult:
    """Sweep the grid; objective = grad-evals to ρ=1/e (lower is better).

    ``integrator`` ("leapfrog" or "two_stage") threads to the mjhmc/control
    runs so the north-star receipts can tune the integrator axis jointly
    with (ε, β, M) — the two-stage splitting costs 2 evals/step, which the
    samplers' grad_evals counters already charge, so the eval-normalized
    objective stays fair across integrators (VERDICT r4 item 2).
    """
    if integrator != "leapfrog" and sampler not in ("mjhmc", "control"):
        raise ValueError(
            f"integrator={integrator!r} is only tunable for mjhmc/control"
        )
    table = []
    key0 = jax.random.key(seed)

    for m in m_grid:
        # per-M lag window: the eval axis is lag × (~M evals/step); widen
        # small-M windows so a censored short window can never look "best"
        # (same discipline as search.bayes)
        nl = int(min(num_steps * 0.6, nlags * max(1.0, 10.0 / m)))
        if sampler == "mjhmc":
            state0 = make_mj_state(dist, key0, nbatch)

            @jax.jit
            def run(eps, beta, key, state0=state0, m=m, nl=nl):
                st, out = mjhmc_run(
                    dist, state0, key, num_steps, eps, beta, m,
                    integrator=integrator,
                )
                rho = weighted_autocorrelation(out["x"], out["dwell"], nl)
                return rho, jnp.sum(st.grad_evals)

        elif sampler == "control":
            state0 = make_hmc_state(dist, key0, nbatch)

            @jax.jit
            def run(eps, beta, key, state0=state0, m=m, nl=nl):
                st, out = hmc_run(
                    dist, state0, key, num_steps, eps, beta, m,
                    integrator=integrator,
                )
                rho = weighted_autocorrelation(out["x"], None, nl)
                return rho, jnp.sum(st.grad_evals)

        elif sampler == "malt":
            # second grid coordinate = MALT's friction γ
            from mjhmc_tpu.samplers.malt import malt_run

            state0 = make_hmc_state(dist, key0, nbatch)

            @jax.jit
            def run(eps, gamma, key, state0=state0, m=m, nl=nl):
                st, out = malt_run(dist, state0, key, num_steps, eps, gamma, m)
                rho = weighted_autocorrelation(out["x"], None, nl)
                return rho, jnp.sum(st.grad_evals)

        else:
            raise ValueError(sampler)

        for i, (eps, beta) in enumerate(itertools.product(eps_grid, beta_grid)):
            rho, evals = run(
                jnp.float32(eps), jnp.float32(beta), jax.random.fold_in(key0, i)
            )
            rho = np.asarray(rho)
            evals_per_step = float(evals) / (num_steps * nbatch)
            axis = np.arange(nl) * evals_per_step
            decay = _decay_time(axis, rho)
            if not np.isfinite(rho).all():
                decay = float("inf")
            censored = np.isfinite(decay) and decay >= axis[-1] * 0.999
            table.append(
                dict(
                    epsilon=float(eps),
                    beta=float(beta),
                    num_leapfrog_steps=int(m),
                    decay_evals=decay,
                    censored=bool(censored),
                )
            )

    # best = smallest UNCENSORED decay (censored values are lower bounds)
    good = [
        r
        for r in table
        if np.isfinite(r["decay_evals"]) and not r.get("censored", False)
    ]
    best = min(good or table, key=lambda r: r["decay_evals"])
    return SearchResult(best=best, table=table)
