"""Reduced-flip HMC — the paper's intermediate discrete-time variant.

Sits between control HMC and the jump process (SURVEY.md §2.4 lists the
ladder version; arXiv:1509.03808): per iteration, after the β momentum
corruption, instead of flipping on *every* rejection the chain flips only
with the excess backward leap probability

    p_leap(ζ)  = min(1, exp(H(ζ) − H(Lζ)))
    p_flip(ζ)  = max(0, p_leap(Fζ) − p_leap(ζ))      (note p_leap(Fζ)
                 needs H(LFζ) = H(L⁻¹ζ), the backward trajectory)
    p_stay     = 1 − p_leap − p_flip.

π-stationarity follows from the same telescoping balance as the F-clock's
max(0,·) rate (exact finite-state check:
``algebraic.reduced_flip_transition_matrix`` + ``tests/test_ladder.py``).

Cost model: unlike MJHMC, the per-step momentum corruption perturbs v, so
the backward energy H(L⁻¹ζ) can never be reused from a cache — each
iteration honestly costs **2M gradient evaluations** (forward + backward
trajectories). That cost is precisely the paper's motivation for the
continuous-time process, whose cache trick brings it back to ~M. The TPU
implementation runs both trajectories as one stacked (2, ndims, nbatch)
leapfrog (same fused layout as ``mjhmc.mjhmc_step``), so hardware cost per
step matches MJHMC's; only the algorithmic counter differs.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from mjhmc_tpu.models.base import Distribution
from mjhmc_tpu.ops.leapfrog import leapfrog, momentum_scale, total_energy
from mjhmc_tpu.samplers.mjhmc import MomentAccumulator
from mjhmc_tpu.samplers.state import HMCState, make_hmc_state

Array = jax.Array


class RFStepOut(NamedTuple):
    x: Array  # (ndims, nbatch) post-transition positions
    sel: Array  # (nbatch,) int8: 0=leap, 1=flip, 2=stay
    accept_stat: Array  # (nbatch,) p_leap — dual-averaging signal


def reduced_flip_hmc_step(
    dist: Distribution,
    state: HMCState,
    key: Array,
    epsilon: Array | float,
    beta: Array | float,
    num_leapfrog_steps: int,
    unroll: int = 1,
    inv_mass: Array | None = None,
) -> Tuple[HMCState, RFStepOut]:
    """One reduced-flip iteration across all chains.

    β is the per-step partial momentum corruption v ← √(1−β)v + √β ξ
    (same semantics as ``hmc.hmc_step``).
    """
    chain = state.chain
    x, u, g = chain.x, chain.u, chain.grad
    m = num_leapfrog_steps
    beta = jnp.asarray(beta, jnp.float32)

    k_noise, k_sel = jax.random.split(key)
    xi = momentum_scale(inv_mass) * jax.random.normal(
        k_noise, chain.v.shape, chain.v.dtype
    )
    v = jnp.sqrt(1.0 - beta) * chain.v + jnp.sqrt(beta) * xi
    h0 = total_energy(u, v, inv_mass)

    # fused forward + backward trajectories on a NEW leading axis (never
    # concatenate the sharded chain axis — tests/test_collectives.py)
    x2 = jnp.stack([x, x])
    v2 = jnp.stack([v, -v])
    g2 = jnp.stack([g, g])
    x2f, v2f, u2f, g2f = leapfrog(
        dist.potential_and_grad, x2, v2, g2, epsilon, m, unroll=unroll,
        inv_mass=inv_mass,
    )
    x_l, v_l, u_l, g_l = x2f[0], v2f[0], u2f[0], g2f[0]
    h_l = total_energy(u_l, v_l, inv_mass)  # H(Lζ)
    h_b = total_energy(u2f[1], v2f[1], inv_mass)  # H(L⁻¹ζ)

    def leap_prob(h_to):
        p = jnp.exp(jnp.minimum(0.0, h0 - h_to))
        return jnp.where(jnp.isfinite(h_to), p, 0.0)

    p_leap = leap_prob(h_l)
    p_flip = jnp.maximum(0.0, leap_prob(h_b) - p_leap)

    uni = jax.random.uniform(k_sel, p_leap.shape, jnp.float32)
    is_l = uni < p_leap
    is_f = (~is_l) & (uni < p_leap + p_flip)
    sel = jnp.where(is_l, 0, jnp.where(is_f, 1, 2)).astype(jnp.int8)

    bl = is_l[None, :]
    x_new = jnp.where(bl, x_l, x)
    v_new = jnp.where(bl, v_l, jnp.where(is_f[None, :], -v, v))
    u_new = jnp.where(is_l, u_l, u)
    g_new = jnp.where(bl, g_l, g)

    new_state = HMCState(
        chain=chain._replace(x=x_new, v=v_new, u=u_new, grad=g_new),
        # honest cost model: corruption invalidates any backward cache, so
        # every iteration pays forward + backward trajectories
        grad_evals=state.grad_evals + jnp.int32(2 * m),
        n_accept=state.n_accept + is_l.astype(jnp.int32),
    )
    return new_state, RFStepOut(x=x_new, sel=sel, accept_stat=p_leap)


def reduced_flip_hmc_run(
    dist: Distribution,
    state: HMCState,
    key: Array,
    num_steps: int,
    epsilon: Array | float,
    beta: Array | float,
    num_leapfrog_steps: int,
    unroll: int = 1,
    collect: str = "samples",
    inv_mass: Array | None = None,
) -> Tuple[HMCState, dict]:
    """Scan ``num_steps`` reduced-flip iterations (collect: samples|stats)."""
    keys = jax.random.split(key, num_steps)
    ndims, nbatch = state.chain.x.shape

    if collect == "samples":

        def body(carry, k):
            s, o = reduced_flip_hmc_step(
                dist, carry, k, epsilon, beta, num_leapfrog_steps, unroll,
                inv_mass,
            )
            ev = jnp.mean(s.grad_evals.astype(jnp.float32))
            return s, (o.x, o.sel, o.accept_stat, ev)

        state, (xs, sel, astat, ev) = lax.scan(body, state, keys)
        return state, {"x": xs, "sel": sel, "accept_stat": astat, "evals_mean": ev}

    if collect == "stats":
        acc0 = MomentAccumulator.init(ndims, nbatch)
        ones = jnp.ones((nbatch,), jnp.float32)

        def body(carry, k):
            s, a = carry
            s, o = reduced_flip_hmc_step(
                dist, s, k, epsilon, beta, num_leapfrog_steps, unroll,
                inv_mass,
            )
            return (s, a.update(o.x, ones)), None

        (state, acc), _ = lax.scan(body, (state, acc0), keys)
        return state, {"moments": acc}

    raise ValueError(f"unknown collect mode: {collect}")


@dataclasses.dataclass
class ReducedFlipHMC:
    """Reference-style wrapper (SURVEY.md L3 interface)."""

    distribution: Distribution
    epsilon: float = 1.0
    beta: float = 0.2
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
            lambda s, k, n_steps, collect: reduced_flip_hmc_run(
                self.distribution,
                s,
                k,
                n_steps,
                self.epsilon,
                self.beta,
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

    def sampling_iteration(self) -> RFStepOut:
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
