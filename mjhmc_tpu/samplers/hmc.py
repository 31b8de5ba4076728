"""Standard / control HMC baseline.

Discrete-time HMC control matched to MJHMC's gradient budget
(SURVEY.md §3.2): per iteration — partial momentum corruption with β;
M-step leapfrog; Metropolis accept of FLζ with p = min(1, exp(H(ζ) −
H(FLζ))); momentum flip on reject (the "control" variant, so trajectory
direction persistence matches MJHMC's F-operator semantics and gradient
budgets are comparable).

Same TPU structure as ``mjhmc``: one pure step, ``lax.scan``, masked
accept/reject blends, cached entry gradients (M evals per iteration).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from mjhmc_tpu.models.base import Distribution
from mjhmc_tpu.ops.leapfrog import INTEGRATORS, momentum_scale, total_energy
from mjhmc_tpu.samplers.state import HMCState, make_hmc_state
from mjhmc_tpu.samplers.mjhmc import MomentAccumulator

Array = jax.Array


class HMCStepOut(NamedTuple):
    x: Array  # (ndims, nbatch) post-transition positions
    accept: Array  # (nbatch,) bool
    accept_stat: Array  # (nbatch,) min(1, exp(-ΔH)) — dual-averaging signal


def hmc_step(
    dist: Distribution,
    state: HMCState,
    key: Array,
    epsilon: Array | float,
    beta: Array | float,
    num_leapfrog_steps: int,
    unroll: int = 1,
    flip_on_reject: bool = True,
    inv_mass: Array | None = None,
    integrator: str = "leapfrog",
) -> Tuple[HMCState, HMCStepOut]:
    """One control-HMC iteration across all chains.

    ``beta`` is the per-step momentum-corruption fraction:
    v ← √(1−β)·v + √β·ξ, ξ ~ N(0, M). β=1 is standard HMC with full
    momentum refresh each iteration. ``inv_mass``: optional (ndims, 1)
    diagonal M⁻¹ preconditioner. ``integrator``: "leapfrog" (1 eval/step)
    or "two_stage" (minimal-error splitting, 2 evals/step — charged
    honestly in the counters; arXiv:1912.03253).
    """
    chain = state.chain
    x, u, g = chain.x, chain.u, chain.grad
    beta = jnp.asarray(beta, jnp.float32)

    k_noise, k_mh = jax.random.split(key)
    xi = momentum_scale(inv_mass) * jax.random.normal(
        k_noise, chain.v.shape, chain.v.dtype
    )
    v = jnp.sqrt(1.0 - beta) * chain.v + jnp.sqrt(beta) * xi

    step_fn, evals_per_step = INTEGRATORS[integrator]
    h0 = total_energy(u, v, inv_mass)
    x_l, v_l, u_l, g_l = step_fn(
        dist.potential_and_grad, x, v, g, epsilon, num_leapfrog_steps, unroll,
        inv_mass=inv_mass,
    )
    h_l = total_energy(u_l, v_l, inv_mass)

    log_p = jnp.minimum(0.0, h0 - h_l)
    # divergence-guarded: NaN h_l must read as rejection, not NaN stat
    accept_stat = jnp.where(jnp.isfinite(h_l), jnp.exp(log_p), 0.0)
    log_u = jnp.log(jax.random.uniform(k_mh, log_p.shape, jnp.float32))
    accept = (log_u < log_p) & jnp.isfinite(h_l)

    ba = accept[None, :]
    x_new = jnp.where(ba, x_l, x)
    # reject → momentum flip (control variant) or keep (plain HMC)
    v_rej = -v if flip_on_reject else v
    v_new = jnp.where(ba, v_l, v_rej)
    u_new = jnp.where(accept, u_l, u)
    g_new = jnp.where(ba, g_l, g)

    new_state = HMCState(
        chain=chain._replace(x=x_new, v=v_new, u=u_new, grad=g_new),
        grad_evals=state.grad_evals
        + jnp.int32(evals_per_step * num_leapfrog_steps),
        n_accept=state.n_accept + accept.astype(jnp.int32),
    )
    return new_state, HMCStepOut(x=x_new, accept=accept, accept_stat=accept_stat)


def hmc_run(
    dist: Distribution,
    state: HMCState,
    key: Array,
    num_steps: int,
    epsilon: Array | float,
    beta: Array | float,
    num_leapfrog_steps: int,
    unroll: int = 1,
    collect: str = "samples",
    flip_on_reject: bool = True,
    inv_mass: Array | None = None,
    integrator: str = "leapfrog",
) -> Tuple[HMCState, dict]:
    """Scan ``num_steps`` HMC iterations (collect: "samples" | "stats")."""
    keys = jax.random.split(key, num_steps)
    ndims, nbatch = state.chain.x.shape

    if collect == "samples":

        def body(carry, k):
            s, o = hmc_step(
                dist, carry, k, epsilon, beta, num_leapfrog_steps, unroll,
                flip_on_reject, inv_mass, integrator,
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
            s, o = hmc_step(
                dist, s, k, epsilon, beta, num_leapfrog_steps, unroll,
                flip_on_reject, inv_mass, integrator,
            )
            return (s, a.update(o.x, ones)), None

        (state, acc), _ = lax.scan(body, (state, acc0), keys)
        return state, {"moments": acc}

    raise ValueError(f"unknown collect mode: {collect}")


@dataclasses.dataclass
class ControlHMC:
    """Reference-style wrapper (SURVEY.md L3 interface)."""

    distribution: Distribution
    epsilon: float = 1.0
    beta: float = 0.2
    num_leapfrog_steps: int = 5
    nbatch: int = 128
    seed: int = 0
    unroll: int = 1
    flip_on_reject: bool = True
    integrator: str = "leapfrog"  # or "two_stage" (arXiv:1912.03253)
    # diagonal mass matrix M per dim (Stan convention: M⁻¹ = target
    # covariance diagonal ⇒ pass precisions 1/variance here)
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
            lambda s, k, n_steps, collect: hmc_run(
                self.distribution,
                s,
                k,
                n_steps,
                self.epsilon,
                self.beta,
                self.num_leapfrog_steps,
                self.unroll,
                collect,
                self.flip_on_reject,
                inv_mass,
                self.integrator,
            ),
            static_argnums=(2, 3),
        )

    def _next_key(self) -> Array:
        self._key, k = jax.random.split(self._key)
        return k

    def sampling_iteration(self) -> HMCStepOut:
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
