"""Dual-averaging step-size adaptation (on-device).

Replaces the reference's offline Spearmint hyperparameter search
(SURVEY.md §2.8 / L6) with Nesterov dual averaging on the step size
(Hoffman & Gelman, arXiv:1111.4246 §3.2), running inside the sampler scan:
the per-step acceptance statistic is averaged across **all** chains —
under a chain-sharded mesh that mean compiles to a psum over the mesh
(the only collective in the adaptive hot loop, SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from mjhmc_tpu.models.base import Distribution
from mjhmc_tpu.samplers.mjhmc import mjhmc_step, MomentAccumulator
from mjhmc_tpu.samplers.hmc import hmc_step
from mjhmc_tpu.samplers.state import MJState, HMCState

Array = jax.Array


class DualAveragingState(NamedTuple):
    step: Array  # i32
    log_eps: Array  # current log step size
    log_eps_bar: Array  # averaged iterate (the one to freeze)
    h_bar: Array  # running error statistic
    mu: Array  # shrinkage target


def da_init(eps0: float) -> DualAveragingState:
    log_eps0 = jnp.float32(jnp.log(eps0))
    return DualAveragingState(
        step=jnp.int32(0),
        log_eps=log_eps0,
        log_eps_bar=log_eps0,
        h_bar=jnp.float32(0.0),
        mu=jnp.float32(jnp.log(10.0) + log_eps0),
    )


def da_update(
    da: DualAveragingState,
    accept_mean: Array,
    target: float = 0.65,
    gamma: float = 0.05,
    t0: float = 10.0,
    kappa: float = 0.75,
) -> DualAveragingState:
    step = da.step + 1
    stepf = step.astype(jnp.float32)
    frac = 1.0 / (stepf + t0)
    h_bar = (1.0 - frac) * da.h_bar + frac * (target - accept_mean)
    log_eps = da.mu - jnp.sqrt(stepf) / gamma * h_bar
    eta = stepf ** (-kappa)
    log_eps_bar = eta * log_eps + (1.0 - eta) * da.log_eps_bar
    return DualAveragingState(step, log_eps, log_eps_bar, h_bar, da.mu)


def da_epsilon(da: DualAveragingState, frozen: bool = False) -> Array:
    return jnp.exp(da.log_eps_bar if frozen else da.log_eps)


def adaptive_mjhmc_run(
    dist: Distribution,
    state: MJState,
    da: DualAveragingState,
    key: Array,
    num_steps: int,
    beta: Array | float,
    num_leapfrog_steps: int,
    target_accept: float = 0.65,
    unroll: int = 1,
) -> Tuple[MJState, DualAveragingState, dict]:
    """Warmup scan: MJHMC step + dual-averaging ε update each iteration.

    ``jnp.mean(accept_stat)`` is a global cross-chain mean — with the chain
    axis sharded over a mesh, XLA lowers it to a psum (the full "training
    step" exercised by ``__graft_entry__.dryrun_multichip``).
    """
    keys = jax.random.split(key, num_steps)
    ndims, nbatch = state.chain.x.shape
    acc0 = MomentAccumulator.init(ndims, nbatch)

    def body(carry, k):
        s, d, a = carry
        eps = jnp.exp(d.log_eps)
        s, out = mjhmc_step(dist, s, k, eps, beta, num_leapfrog_steps, unroll)
        d = da_update(d, jnp.mean(out.accept_stat), target=target_accept)
        return (s, d, a.update(out.x, out.dwell)), eps

    (state, da, acc), eps_trace = lax.scan(body, (state, da, acc0), keys)
    return state, da, {"moments": acc, "eps_trace": eps_trace}


def estimate_inv_mass(acc: "MomentAccumulator") -> Array:
    """Diagonal M⁻¹ from dwell-weighted sample variances (Stan-style:
    mass ≈ posterior covariance diagonal ⇒ M⁻¹ = var), shape (ndims, 1).
    Cross-chain sums lower to psums under sharding."""
    w = jnp.sum(acc.w)
    mean = jnp.sum(acc.wx, axis=1) / w
    var = jnp.sum(acc.wx2, axis=1) / w - mean * mean
    return jnp.maximum(var, 1e-8)[:, None]


def mjhmc_full_warmup(
    dist: Distribution,
    key: Array,
    nbatch: int,
    beta: float = 0.1,
    num_leapfrog_steps: int = 5,
    eps0: float = 0.5,
    phase1: int = 300,
    phase2: int = 300,
    phase3: int = 200,
    target_accept: float = 0.65,
):
    """Stan-style three-phase warmup: (1) dual-average ε with unit mass,
    (2) continue adapting ε while accumulating variance → set M⁻¹,
    (3) re-tune ε under the new metric. Returns (state, eps, inv_mass).

    The whole warmup is jit-compatible and collective-correct under a
    chain-sharded mesh (means/psums only in the adaptation statistics).
    """
    from mjhmc_tpu.samplers.state import make_mj_state

    k0, k1, k2, k3 = jax.random.split(key, 4)
    state = make_mj_state(dist, k0, nbatch)

    da = da_init(eps0)
    state, da, _ = adaptive_mjhmc_run(
        dist, state, da, k1, phase1, beta, num_leapfrog_steps, target_accept
    )
    state, da, aux = adaptive_mjhmc_run(
        dist, state, da, k2, phase2, beta, num_leapfrog_steps, target_accept
    )
    inv_mass = estimate_inv_mass(aux["moments"])
    # momenta move to N(0, M)
    state = state._replace(
        chain=state.chain._replace(v=state.chain.v / jnp.sqrt(inv_mass)),
        back_valid=jnp.zeros_like(state.back_valid),  # old caches invalid
    )

    # restart dual averaging from the frozen phase-2 ε (traced — jit-safe)
    log_eps0 = da.log_eps_bar
    da = DualAveragingState(
        step=jnp.int32(0),
        log_eps=log_eps0,
        log_eps_bar=log_eps0,
        h_bar=jnp.float32(0.0),
        mu=jnp.log(10.0) + log_eps0,
    )
    keys = jax.random.split(k3, phase3)
    from mjhmc_tpu.samplers.mjhmc import mjhmc_step

    def body(carry, k):
        s, d = carry
        eps = jnp.exp(d.log_eps)
        s, out = mjhmc_step(
            dist, s, k, eps, beta, num_leapfrog_steps, inv_mass=inv_mass
        )
        d = da_update(d, jnp.mean(out.accept_stat), target=target_accept)
        return (s, d), None

    (state, da), _ = lax.scan(body, (state, da), keys)
    return state, da_epsilon(da, frozen=True), inv_mass


def adaptive_hmc_run(
    dist: Distribution,
    state: HMCState,
    da: DualAveragingState,
    key: Array,
    num_steps: int,
    beta: Array | float,
    num_leapfrog_steps: int,
    target_accept: float = 0.65,
    unroll: int = 1,
) -> Tuple[HMCState, DualAveragingState, dict]:
    """Warmup scan for control HMC with dual averaging."""
    keys = jax.random.split(key, num_steps)
    ndims, nbatch = state.chain.x.shape
    acc0 = MomentAccumulator.init(ndims, nbatch)
    ones = jnp.ones((nbatch,), jnp.float32)

    def body(carry, k):
        s, d, a = carry
        eps = jnp.exp(d.log_eps)
        s, out = hmc_step(dist, s, k, eps, beta, num_leapfrog_steps, unroll)
        d = da_update(d, jnp.mean(out.accept_stat), target=target_accept)
        return (s, d, a.update(out.x, ones)), eps

    (state, da, acc), eps_trace = lax.scan(body, (state, da, acc0), keys)
    return state, da, {"moments": acc, "eps_trace": eps_trace}


def adaptive_malt_run(
    dist: Distribution,
    state: HMCState,
    da: DualAveragingState,
    key: Array,
    num_steps: int,
    gamma: Array | float,
    num_leapfrog_steps: int,
    target_accept: float = 0.8,
    unroll: int = 1,
) -> Tuple[HMCState, DualAveragingState, dict]:
    """Warmup scan for MALT with dual averaging on the step size.

    The trajectory-level acceptance statistic min(1, exp(−Δ)) plays the
    same role as HMC's; the MALT paper targets higher acceptance (~0.8)
    than HMC's 0.65 because Δ aggregates L leapfrog errors.
    """
    from mjhmc_tpu.samplers.malt import malt_step

    keys = jax.random.split(key, num_steps)
    ndims, nbatch = state.chain.x.shape
    acc0 = MomentAccumulator.init(ndims, nbatch)
    ones = jnp.ones((nbatch,), jnp.float32)

    def body(carry, k):
        s, d, a = carry
        eps = jnp.exp(d.log_eps)
        s, out = malt_step(dist, s, k, eps, gamma, num_leapfrog_steps, unroll)
        d = da_update(d, jnp.mean(out.accept_stat), target=target_accept)
        return (s, d, a.update(out.x, ones)), eps

    (state, da, acc), eps_trace = lax.scan(body, (state, da, acc0), keys)
    return state, da, {"moments": acc, "eps_trace": eps_trace}


def nuts_full_warmup(
    dist: Distribution,
    key: Array,
    nbatch: int,
    eps0: float = 0.5,
    max_depth: int = 8,
    phase1: int = 60,
    phase2: int = 60,
    phase3: int = 40,
    target_accept: float = 0.8,
):
    """Stan-style NUTS warmup: (1) dual-average ε with unit mass, (2)
    continue adapting ε while accumulating per-dim variance → diagonal M⁻¹,
    (3) re-tune ε under the metric. Returns (state, eps, inv_mass).

    The same three-phase protocol as ``mjhmc_full_warmup`` built on
    ``nuts_step`` — used by the north-star receipts so the NUTS baseline
    runs with the mass-matrix support ``nuts_step`` already has
    (SURVEY.md §7 hard part 4; VERDICT r2 weak #3: ε-only tuning left an
    order of magnitude on the table for ill-conditioned targets).
    """
    from mjhmc_tpu.samplers.mjhmc import MomentAccumulator
    from mjhmc_tpu.samplers.nuts import make_nuts_state, nuts_step

    k0, k1, k2, k3 = jax.random.split(key, 4)
    state = make_nuts_state(dist, k0, nbatch)
    ndims = dist.ndims
    ones = jnp.ones((nbatch,), jnp.float32)

    def phase(state, da, keys, inv_mass, accumulate):
        acc0 = MomentAccumulator.init(ndims, nbatch)

        def body(carry, k):
            s, d, a = carry
            eps = jnp.exp(d.log_eps)
            s, out = nuts_step(
                dist, s, k, eps, max_depth=max_depth, inv_mass=inv_mass
            )
            d = da_update(d, jnp.mean(out.accept_stat), target=target_accept)
            if accumulate:
                a = a.update(out.x, ones)
            return (s, d, a), None

        (state, da, acc), _ = lax.scan(body, (state, da, acc0), keys)
        return state, da, acc

    da = da_init(eps0)
    state, da, _ = phase(state, da, jax.random.split(k1, phase1), None, False)
    state, da, acc = phase(state, da, jax.random.split(k2, phase2), None, True)
    inv_mass = estimate_inv_mass(acc)

    log_eps0 = da.log_eps_bar
    da = DualAveragingState(
        step=jnp.int32(0),
        log_eps=log_eps0,
        log_eps_bar=log_eps0,
        h_bar=jnp.float32(0.0),
        mu=jnp.log(10.0) + log_eps0,
    )
    state, da, _ = phase(
        state, da, jax.random.split(k3, phase3), inv_mass, False
    )
    return state, da_epsilon(da, frozen=True), inv_mass
