"""MALT — Metropolis Adjusted Langevin Trajectories.

Beyond-reference baseline from the retrieved-paper set (SURVEY.md §2.9
[P2]; arXiv:2210.12200, Riou-Durand & Vogrinc 2022). MALT runs kinetic
(underdamped) Langevin dynamics for a fixed trajectory of L steps —
OBABO splitting: half momentum-refresh (O), leapfrog kick-drift-kick
(BAB), half refresh (O) — and Metropolis-corrects the WHOLE trajectory
with the accumulated energy error of the deterministic BAB blocks only
(the O half-steps preserve the Gaussian momentum measure exactly, so
they drop out of the ratio). The friction γ replaces NUTS' U-turn
machinery: damping forgets initial momenta at rate γ, so trajectories
can't double back coherently, while rejection still restores exactness.

Relative to the samplers the reference ships (SURVEY.md §2.3) this sits
between ControlHMC (γ=0 ⇒ MALT *is* HMC with full refresh — tested) and
full Langevin diffusion (γ→∞ ⇒ MALA-like). Cost model: exactly L
gradient evaluations per iteration via the cached-entry-gradient
contract (ops/leapfrog.py docstring), so its fairness counters are
directly comparable to HMC/MJHMC.

TPU structure mirrors samplers/hmc.py: one pure step over all chains,
``lax.scan`` over the trajectory and over iterations, masked
accept/reject blends, no data-dependent shapes.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from mjhmc_tpu.models.base import Distribution
from mjhmc_tpu.ops.leapfrog import momentum_scale, total_energy
from mjhmc_tpu.samplers.mjhmc import MomentAccumulator
from mjhmc_tpu.samplers.state import HMCState, make_hmc_state

Array = jax.Array


class MALTStepOut(NamedTuple):
    x: Array  # (ndims, nbatch) post-transition positions
    accept: Array  # (nbatch,) bool
    accept_stat: Array  # (nbatch,) min(1, exp(-Δ)) — dual-averaging signal


def malt_step(
    dist: Distribution,
    state: HMCState,
    key: Array,
    epsilon: Array | float,
    gamma: Array | float,
    num_leapfrog_steps: int,
    unroll: int = 1,
    inv_mass: Array | None = None,
) -> Tuple[HMCState, MALTStepOut]:
    """One MALT iteration across all chains.

    ``gamma`` is the friction (per unit time): each O half-step damps
    momenta by η = exp(−γε/2) and re-noises with √(1−η²)·N(0, M).
    γ=0 reduces to standard HMC with full refresh per iteration.
    """
    chain = state.chain
    x0, u0, g0 = chain.x, chain.u, chain.grad
    eps = jnp.asarray(epsilon, x0.dtype)
    eta = jnp.exp(-jnp.asarray(gamma, jnp.float32) * eps / 2.0)
    sig = jnp.sqrt(jnp.maximum(0.0, 1.0 - eta * eta))
    scale = momentum_scale(inv_mass)

    k_v, k_traj, k_mh = jax.random.split(key, 3)
    v0 = scale * jax.random.normal(k_v, x0.shape, x0.dtype)
    nbatch = x0.shape[-1]

    def body(carry, k):
        x, v, g, u, delta = carry
        k1, k2 = jax.random.split(k)
        # O: exact OU half-step (leaves N(0, M) invariant — no energy term)
        v = eta * v + sig * scale * jax.random.normal(k1, v.shape, v.dtype)
        h_in = total_energy(u, v, inv_mass)
        # BAB: one deterministic leapfrog step; its energy error enters Δ
        v_half = v - 0.5 * eps * g
        dx = v_half if inv_mass is None else inv_mass * v_half
        x_new = x + eps * dx
        u_new, g_new = dist.potential_and_grad(x_new)
        v_new = v_half - 0.5 * eps * g_new
        h_out = total_energy(u_new, v_new, inv_mass)
        # O
        v_out = eta * v_new + sig * scale * jax.random.normal(k2, v.shape, v.dtype)
        return (x_new, v_out, g_new, u_new, delta + (h_out - h_in)), None

    keys = jax.random.split(k_traj, num_leapfrog_steps)
    (x_l, v_l, g_l, u_l, delta), _ = lax.scan(
        body,
        (x0, v0, g0, u0, jnp.zeros((nbatch,), jnp.float32)),
        keys,
        unroll=unroll,
    )

    log_p = jnp.minimum(0.0, -delta)
    # divergence-guarded: NaN Δ must read as rejection, not NaN stat
    accept_stat = jnp.where(jnp.isfinite(delta), jnp.exp(log_p), 0.0)
    log_u = jnp.log(jax.random.uniform(k_mh, log_p.shape, jnp.float32))
    accept = (log_u < log_p) & jnp.isfinite(delta)

    ba = accept[None, :]
    x_new = jnp.where(ba, x_l, x0)
    # momentum is fully refreshed next iteration; store the trajectory's end
    # momentum on accept (flip-on-reject is a no-op under full refresh)
    v_new = jnp.where(ba, v_l, -v0)
    u_new = jnp.where(accept, u_l, u0)
    g_new = jnp.where(ba, g_l, g0)

    new_state = HMCState(
        chain=chain._replace(x=x_new, v=v_new, u=u_new, grad=g_new),
        grad_evals=state.grad_evals + jnp.int32(num_leapfrog_steps),
        n_accept=state.n_accept + accept.astype(jnp.int32),
    )
    return new_state, MALTStepOut(x=x_new, accept=accept, accept_stat=accept_stat)


def malt_run(
    dist: Distribution,
    state: HMCState,
    key: Array,
    num_steps: int,
    epsilon: Array | float,
    gamma: Array | float,
    num_leapfrog_steps: int,
    unroll: int = 1,
    collect: str = "samples",
    inv_mass: Array | None = None,
) -> Tuple[HMCState, dict]:
    """Scan ``num_steps`` MALT iterations (collect: "samples" | "stats")."""
    keys = jax.random.split(key, num_steps)
    ndims, nbatch = state.chain.x.shape

    if collect == "samples":

        def body(carry, k):
            s, o = malt_step(
                dist, carry, k, epsilon, gamma, num_leapfrog_steps, unroll,
                inv_mass,
            )
            ev = jnp.mean(s.grad_evals.astype(jnp.float32))
            return s, (o.x, o.accept, o.accept_stat, ev)

        state, (xs, acc, astat, ev) = lax.scan(body, state, keys)
        return state, {
            "x": xs, "accept": acc, "accept_stat": astat, "evals_mean": ev,
        }

    if collect == "stats":
        acc0 = MomentAccumulator.init(ndims, nbatch)
        ones = jnp.ones((nbatch,), jnp.float32)

        def body(carry, k):
            s, a = carry
            s, o = malt_step(
                dist, s, k, epsilon, gamma, num_leapfrog_steps, unroll,
                inv_mass,
            )
            return (s, a.update(o.x, ones)), None

        (state, acc), _ = lax.scan(body, (state, acc0), keys)
        return state, {"moments": acc}

    raise ValueError(f"unknown collect mode: {collect}")


@dataclasses.dataclass
class MALT:
    """Reference-style wrapper (same L3 interface as ControlHMC)."""

    distribution: Distribution
    epsilon: float = 1.0
    gamma: float = 1.0
    num_leapfrog_steps: int = 5
    nbatch: int = 128
    seed: int = 0
    unroll: int = 1
    mass_diag: tuple | None = None

    def __post_init__(self):
        self._key = jax.random.key(self.seed)
        self._key, k0 = jax.random.split(self._key)
        self.state = make_hmc_state(self.distribution, k0, self.nbatch)
        inv_mass = None
        if self.mass_diag is not None:
            import numpy as _np

            inv_mass = jnp.asarray(
                1.0 / _np.asarray(self.mass_diag, _np.float32)
            )[:, None]
            self.state = self.state._replace(
                chain=self.state.chain._replace(
                    v=self.state.chain.v / jnp.sqrt(inv_mass)
                )
            )
        self._run = jax.jit(
            lambda s, k, n_steps, collect: malt_run(
                self.distribution,
                s,
                k,
                n_steps,
                self.epsilon,
                self.gamma,
                self.num_leapfrog_steps,
                self.unroll,
                collect,
                inv_mass,
            ),
            static_argnums=(2, 3),
        )

    def _next_key(self) -> Array:
        self._key, k = jax.random.split(self._key)
        return k

    def sampling_iteration(self) -> MALTStepOut:
        self.state, outs = self._run(self.state, self._next_key(), 1, "samples")
        return outs

    def sample(self, num_steps: int) -> dict:
        self.state, outs = self._run(
            self.state, self._next_key(), num_steps, "samples"
        )
        return outs

    def burn_in(self, num_steps: int = 500) -> None:
        self.state, _ = self._run(self.state, self._next_key(), num_steps, "stats")
        self.state = self.state._replace(
            grad_evals=jnp.zeros_like(self.state.grad_evals),
            n_accept=jnp.zeros_like(self.state.n_accept),
        )

    @property
    def grad_evals(self) -> int:
        return int(jnp.sum(self.state.grad_evals))

    @property
    def accept_rate(self) -> float:
        total = int(jnp.sum(self.state.n_accept))
        steps = int(jnp.sum(self.state.grad_evals)) // self.num_leapfrog_steps
        return total / max(steps, 1)
