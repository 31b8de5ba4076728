"""Tempered SMC head with systematic resampling and HMC mutations.

Required by the north star (SURVEY.md §2.9; ChEES-SMC, arXiv:2504.02627):
anneal particles from a Gaussian prior to the target along
π_λ ∝ exp(−(1−λ)U₀ − λU), with

- **adaptive tempering**: each stage picks Δλ by on-device bisection so the
  post-reweight ESS hits a target fraction (static iteration count — no
  data-dependent control flow);
- **systematic resampling**: global cumulative-weight inversion
  (cumsum + searchsorted). Under a chain-sharded mesh the cumsum/searchsorted
  /gather lower to the all_gather + prefix-sum pattern of SURVEY.md §5.8 —
  GSPMD inserts the collectives; resampling is the only all-to-all in SMC;
- **HMC mutations** targeting π_λ (full momentum refresh each step), with
  Robbins-Monro step-size control toward a target acceptance rate;
- a running **log-evidence estimate** logZ = Σ log⟨w·exp(Δλ δ)⟩ — exact
  oracle available for Gaussian targets (tests).

The number of stages is static; once λ reaches 1 the remaining stages
degrade gracefully to extra mutation sweeps at the target (Δλ=0), keeping
the whole run one ``lax.scan`` under jit.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from mjhmc_tpu.models.base import Distribution
from mjhmc_tpu.ops.leapfrog import leapfrog, total_energy

Array = jax.Array


class SMCState(NamedTuple):
    x: Array  # (ndims, n) particles
    log_w: Array  # (n,) unnormalized log weights
    lam: Array  # () current temperature
    log_z: Array  # () running evidence estimate
    eps: Array  # () mutation step size
    key: Array
    log_tau: Array = None  # () ChEES-adapted total integration time
    chees_m: Array = None  # () ChEES Adam first moment
    chees_v: Array = None  # () ChEES Adam second moment
    chees_step: Array = None  # () i32


class SMCStageOut(NamedTuple):
    lam: Array
    ess: Array
    accept: Array
    eps: Array


def _prior_potential_and_grad(x: Array, scale: float):
    inv = 1.0 / (scale * scale)
    return 0.5 * inv * jnp.sum(x * x, axis=0), x * inv


def _tempered_potential_and_grad(dist: Distribution, scale: float, lam: Array):
    def pg(x):
        u0, g0 = _prior_potential_and_grad(x, scale)
        u1, g1 = dist.potential_and_grad(x)
        return (1.0 - lam) * u0 + lam * u1, (1.0 - lam) * g0 + lam * g1

    return pg


def _ess(log_w: Array) -> Array:
    lw = log_w - jax.scipy.special.logsumexp(log_w)
    return jnp.exp(-jax.scipy.special.logsumexp(2.0 * lw))


def systematic_resample(key: Array, x: Array, log_w: Array) -> Array:
    """Systematic resampling: (d, n) particles by global weight inversion."""
    n = log_w.shape[0]
    lw = log_w - jax.scipy.special.logsumexp(log_w)
    w = jnp.exp(lw)
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), jnp.float32, 0.0, 1.0 / n)
    pos = u0 + jnp.arange(n, dtype=jnp.float32) / n
    ancestors = jnp.searchsorted(cdf, pos)
    ancestors = jnp.clip(ancestors, 0, n - 1)
    return x[:, ancestors]


def _find_delta(log_w: Array, delta_logdens: Array, lam: Array, ess_frac: float,
                n_bisect: int = 30) -> Array:
    """Bisect Δλ ∈ (0, 1−λ] so post-reweight ESS ≈ ess_frac·n (static loop)."""
    n = log_w.shape[0]
    target = ess_frac * n
    hi0 = 1.0 - lam

    def ess_at(d):
        return _ess(log_w + d * delta_logdens)

    # if even the full remaining jump keeps ESS above target, take it
    full_ok = ess_at(hi0) >= target

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        ok = ess_at(mid) >= target
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, hi = lax.fori_loop(0, n_bisect, body, (jnp.float32(0.0), hi0))
    return jnp.where(full_ok, hi0, lo)


def smc_stage(
    dist: Distribution,
    state: SMCState,
    prior_scale: float,
    ess_frac: float,
    num_mutation_steps: int,
    num_leapfrog_steps: int,
    target_accept: float = 0.65,
    rm_rate: float = 0.3,
    mutation: str = "hmc",
    mesh=None,
) -> Tuple[SMCState, SMCStageOut]:
    """One SMC stage: reweight (adaptive Δλ) → resample → mutate.

    ``mutation="chees"`` (arXiv:2504.02627, ChEES-SMC): mutation kernels
    are jittered-trajectory HMC whose total integration time τ ascends the
    ChEES criterion (shared machinery with ``samplers.chees``), realized
    as masked per-particle leapfrog lengths capped at
    ``num_leapfrog_steps`` (the fixed compute budget).

    ``mesh``: REQUIRED when the particle axis is sharded. The in-place
    ``systematic_resample`` inverts the global CDF with ``searchsorted``,
    which GSPMD cannot partition along a sharded axis (dynamic_slice on
    sharded dims); the explicit shard_map path
    (``parallel.collectives.distributed_systematic_resample``) all_gathers
    the (tiny) weight vector instead and equals the single-device result
    exactly. Reweighting/ESS reductions lower to psums either way.
    """
    x, log_w, lam = state.x, state.log_w, state.lam
    n = log_w.shape[0]

    # ---- adaptive reweight -----------------------------------------------
    u0, _ = _prior_potential_and_grad(x, prior_scale)
    u1 = dist.potential(x)
    delta = u0 - u1  # d(log π_λ)/dλ
    d_lam = _find_delta(log_w, delta, lam, ess_frac)
    inc = d_lam * delta

    # evidence increment: log ⟨ŵ · e^inc⟩ under normalized current weights
    lw_norm = log_w - jax.scipy.special.logsumexp(log_w)
    log_z = state.log_z + jax.scipy.special.logsumexp(lw_norm + inc)
    log_w = log_w + inc
    lam = lam + d_lam
    ess = _ess(log_w)

    # ---- resample (always, weights→uniform; Δλ chose ESS≈target) ---------
    key, k_rs = jax.random.split(state.key)
    if mesh is None:
        x = systematic_resample(k_rs, x, log_w)
    else:
        from mjhmc_tpu.parallel.collectives import (
            distributed_systematic_resample,
        )

        x = distributed_systematic_resample(k_rs, x, log_w, mesh)
    log_w = jnp.zeros_like(log_w)

    # ---- mutate: HMC sweeps targeting π_λ --------------------------------
    pg = _tempered_potential_and_grad(dist, prior_scale, lam)
    u, g = pg(x)

    if mutation == "chees":
        from mjhmc_tpu.ops.leapfrog import masked_leapfrog
        from mjhmc_tpu.samplers.chees import CheesState, _adam_ascent, chees_surrogate_grad

        def mut_body(carry, k):
            x, u, g, eps, cs = carry
            k_j, k_v, k_mh = jax.random.split(k, 3)
            tau = jnp.exp(cs.log_tau)
            jitter = jax.random.uniform(k_j, u.shape, jnp.float32, 1e-3, 1.0)
            m_i = jnp.clip(
                jnp.round(jitter * tau / eps).astype(jnp.int32),
                1,
                num_leapfrog_steps,
            )
            v = jax.random.normal(k_v, x.shape, x.dtype)
            h0 = total_energy(u, v)
            xl, vl, ul, gl, steps = masked_leapfrog(
                pg, x, v, g, eps, num_leapfrog_steps, m_i, u0=u
            )
            hl = total_energy(ul, vl)
            log_p = jnp.minimum(0.0, h0 - hl)
            alpha = jnp.where(jnp.isfinite(hl), jnp.exp(log_p), 0.0)
            acc = (jnp.log(jax.random.uniform(k_mh, log_p.shape)) < log_p) & jnp.isfinite(hl)
            am = acc[None, :]
            x = jnp.where(am, xl, x)
            u = jnp.where(acc, ul, u)
            g = jnp.where(am, gl, g)
            tau_i = eps * steps.astype(jnp.float32)
            cs = _adam_ascent(cs, chees_surrogate_grad(x, xl, vl, alpha, tau_i, tau))
            acc_mean = jnp.mean(alpha)
            eps = eps * jnp.exp(rm_rate * (acc_mean - target_accept))
            return (x, u, g, eps, cs), acc_mean

        cs0 = CheesState(
            log_tau=state.log_tau,
            m_adam=state.chees_m,
            v_adam=state.chees_v,
            step=state.chees_step,
        )
        key, k_mut = jax.random.split(key)
        keys = jax.random.split(k_mut, num_mutation_steps)
        (x, u, g, eps, cs), acc_trace = lax.scan(
            mut_body, (x, u, g, state.eps, cs0), keys
        )
        new_state = SMCState(
            x=x, log_w=log_w, lam=lam, log_z=log_z, eps=eps, key=key,
            log_tau=cs.log_tau, chees_m=cs.m_adam, chees_v=cs.v_adam,
            chees_step=cs.step,
        )
        return new_state, SMCStageOut(
            lam=lam, ess=ess, accept=jnp.mean(acc_trace), eps=eps
        )

    def mut_body(carry, k):
        x, u, g, eps = carry
        k_v, k_mh = jax.random.split(k)
        v = jax.random.normal(k_v, x.shape, x.dtype)
        h0 = total_energy(u, v)
        xl, vl, ul, gl = leapfrog(pg, x, v, g, eps, num_leapfrog_steps)
        hl = total_energy(ul, vl)
        log_p = jnp.minimum(0.0, h0 - hl)
        acc = (jnp.log(jax.random.uniform(k_mh, log_p.shape)) < log_p) & jnp.isfinite(hl)
        am = acc[None, :]
        x = jnp.where(am, xl, x)
        u = jnp.where(acc, ul, u)
        g = jnp.where(am, gl, g)
        acc_mean = jnp.mean(jnp.exp(log_p))
        eps = eps * jnp.exp(rm_rate * (acc_mean - target_accept))
        return (x, u, g, eps), acc_mean

    key, k_mut = jax.random.split(key)
    keys = jax.random.split(k_mut, num_mutation_steps)
    (x, u, g, eps), acc_trace = lax.scan(mut_body, (x, u, g, state.eps), keys)

    new_state = state._replace(
        x=x, log_w=log_w, lam=lam, log_z=log_z, eps=eps, key=key
    )
    return new_state, SMCStageOut(
        lam=lam, ess=ess, accept=jnp.mean(acc_trace), eps=eps
    )


def smc_run(
    dist: Distribution,
    key: Array,
    num_particles: int,
    num_stages: int = 20,
    prior_scale: float = 3.0,
    ess_frac: float = 0.5,
    num_mutation_steps: int = 5,
    num_leapfrog_steps: int = 5,
    init_eps: float = 0.25,
    mutation: str = "hmc",
    init_tau: float = 1.0,
    mesh=None,
) -> Tuple[SMCState, dict]:
    """Full annealing run prior → target. Returns final particles ~ p and
    the log-evidence estimate log(Z_target / Z_prior).

    ``mesh``: pass the chain mesh when particles are sharded (routes the
    resample through the explicit collective — see ``smc_stage``)."""
    k_init, k_run = jax.random.split(key)
    x0 = prior_scale * jax.random.normal(
        k_init, (dist.ndims, num_particles), jnp.float32
    )
    state = SMCState(
        x=x0,
        log_w=jnp.zeros((num_particles,), jnp.float32),
        lam=jnp.float32(0.0),
        log_z=jnp.float32(0.0),
        eps=jnp.float32(init_eps),
        key=k_run,
        log_tau=jnp.float32(jnp.log(init_tau)),
        chees_m=jnp.float32(0.0),
        chees_v=jnp.float32(0.0),
        chees_step=jnp.int32(0),
    )

    def body(s, _):
        s, out = smc_stage(
            dist, s, prior_scale, ess_frac, num_mutation_steps,
            num_leapfrog_steps, mutation=mutation, mesh=mesh,
        )
        return s, out

    state, outs = lax.scan(body, state, None, length=num_stages)
    return state, {
        "lam": outs.lam,
        "ess": outs.ess,
        "accept": outs.accept,
        "eps": outs.eps,
    }


@dataclasses.dataclass
class SMC:
    """Convenience wrapper mirroring the sampler class API."""

    distribution: Distribution
    num_particles: int = 4096
    num_stages: int = 20
    prior_scale: float = 3.0
    num_mutation_steps: int = 5
    num_leapfrog_steps: int = 5
    seed: int = 0

    def run(self) -> Tuple[SMCState, dict]:
        fit = jax.jit(
            lambda k: smc_run(
                self.distribution,
                k,
                self.num_particles,
                self.num_stages,
                self.prior_scale,
                num_mutation_steps=self.num_mutation_steps,
                num_leapfrog_steps=self.num_leapfrog_steps,
            )
        )
        self.state, self.trace = fit(jax.random.key(self.seed))
        return self.state, self.trace
