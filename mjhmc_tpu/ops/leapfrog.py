"""Leapfrog (velocity-Verlet) integrator — the inner hot loop.

TPU-native form of the reference's ``leapfrog`` (SURVEY.md §2.3 / §3.1
inner loop): an M-step ``lax.scan`` whose body fuses the position/momentum
updates with one fused energy+gradient evaluation, so each integrator step
costs exactly one ``potential_and_grad`` call and XLA compiles the whole
trajectory into a single fused loop.

Gradient-caching contract (the reference's "cache trick", SURVEY.md §3.1):
the caller passes the gradient at the entry point (already known from the
previous trajectory or init), so an M-step trajectory performs exactly M
gradient evaluations — matching the paper's cost model used for the
fairness counters.

The integrator is time-reversible: ``leapfrog(x, -v)`` traces the inverse
trajectory (L⁻¹ = F∘L∘F), which MJHMC exploits to evaluate backward-rung
energies (SURVEY.md §3.1).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array
PotentialAndGrad = Callable[[Array], Tuple[Array, Array]]


def leapfrog(
    potential_and_grad: PotentialAndGrad,
    x: Array,
    v: Array,
    grad: Array,
    epsilon: Array | float,
    num_steps: int,
    unroll: int = 1,
    inv_mass: Array | None = None,
) -> Tuple[Array, Array, Array, Array]:
    """Run ``num_steps`` leapfrog steps of size ``epsilon``.

    Args:
      potential_and_grad: fused (U, dU/dx) over (ndims, nbatch) batches.
      x, v: positions and momenta, (ndims, nbatch).
      grad: dU/dx at the entry ``x`` (cached from the previous trajectory).
      epsilon: step size — scalar or (nbatch,) broadcastable over chains.
      num_steps: static trajectory length M.
      unroll: lax.scan unroll factor for the hot loop.
      inv_mass: optional diagonal inverse mass matrix M⁻¹, shape (ndims, 1)
        (broadcast over chains). Momenta are then v ~ N(0, M), kinetic
        energy ½vᵀM⁻¹v, and positions advance by ε·M⁻¹v — the standard
        preconditioning for ill-conditioned targets.

    Returns:
      (x', v', U(x'), dU/dx at x') after M steps; exactly M gradient evals.
    """
    eps = jnp.asarray(epsilon, x.dtype)

    def body(carry, _):
        x, v, g, _u = carry
        v_half = v - 0.5 * eps * g
        dx = v_half if inv_mass is None else inv_mass * v_half
        x_new = x + eps * dx
        u_new, g_new = potential_and_grad(x_new)
        v_new = v_half - 0.5 * eps * g_new
        return (x_new, v_new, g_new, u_new), None

    # dummy initial U (overwritten by first step); num_steps >= 1 always
    # (shape computed statically — never slice the possibly-sharded state axis)
    u0 = jnp.zeros(x.shape[:-2] + x.shape[-1:], x.dtype)
    (x_f, v_f, g_f, u_f), _ = lax.scan(
        body, (x, v, grad, u0), None, length=num_steps, unroll=unroll
    )
    return x_f, v_f, u_f, g_f


#: BCSS minimal-error two-stage coefficient (arXiv:1912.03253 §3, after
#: Blanes-Casas-Sanz-Serna): minimizes the O(ε²) Hamiltonian-error constant
#: of the palindromic two-stage splitting B(bε)A(ε/2)B((1−2b)ε)A(ε/2)B(bε).
TWO_STAGE_B = 0.1931833275037836


def two_stage(
    potential_and_grad: PotentialAndGrad,
    x: Array,
    v: Array,
    grad: Array,
    epsilon: Array | float,
    num_steps: int,
    unroll: int = 1,
    inv_mass: Array | None = None,
) -> Tuple[Array, Array, Array, Array]:
    """Minimal-error two-stage splitting integrator (arXiv:1912.03253).

    Same contract as :func:`leapfrog` (reversible, volume-preserving,
    entry gradient cached) but each step performs TWO fused
    ``potential_and_grad`` calls — the trailing kick's gradient carries to
    the next step, so an M-step trajectory costs exactly 2M evaluations
    (callers must charge 2M in the algorithmic counters).

    Why it exists: at a matched gradient-eval budget (run it at 2ε, M/2),
    its energy error constant is ~an order of magnitude below leapfrog's,
    so HMC rejections nearly vanish at step sizes where leapfrog is
    already degrading — the paper's "avoiding rejections" result. Exposed
    through ``integrator="two_stage"`` on the XLA samplers; the fused
    Pallas engines keep leapfrog (its 1-eval/step cost model is the
    reference's fairness currency).
    """
    eps = jnp.asarray(epsilon, x.dtype)
    b = jnp.asarray(TWO_STAGE_B, x.dtype)

    def drift(x, v):
        dx = v if inv_mass is None else inv_mass * v
        return x + (0.5 * eps) * dx

    def body(carry, _):
        x, v, g, _u = carry
        v1 = v - (b * eps) * g
        x1 = drift(x, v1)
        _, g1 = potential_and_grad(x1)
        v2 = v1 - ((1.0 - 2.0 * b) * eps) * g1
        x2 = drift(x1, v2)
        u2, g2 = potential_and_grad(x2)
        v3 = v2 - (b * eps) * g2
        return (x2, v3, g2, u2), None

    u0 = jnp.zeros(x.shape[:-2] + x.shape[-1:], x.dtype)
    (x_f, v_f, g_f, u_f), _ = lax.scan(
        body, (x, v, grad, u0), None, length=num_steps, unroll=unroll
    )
    return x_f, v_f, u_f, g_f


#: integrator registry: name → (stepper fn, gradient evals per step)
INTEGRATORS = {"leapfrog": (leapfrog, 1), "two_stage": (two_stage, 2)}


def masked_leapfrog(
    potential_and_grad: PotentialAndGrad,
    x: Array,
    v: Array,
    grad: Array,
    epsilon: Array | float,
    num_steps_max: int,
    num_steps_per_chain: Array,
    u0: Array | None = None,
    unroll: int = 1,
) -> Tuple[Array, Array, Array, Array, Array]:
    """Leapfrog with per-chain trajectory lengths (fixed compute budget).

    Integrates ``num_steps_max`` steps for every chain; chain ``i`` freezes
    after its own ``num_steps_per_chain[i]`` steps (masked update — the TPU
    form of data-dependent trajectory lengths, used by ChEES adaptation).

    ``u0``: cached U(x) at entry (avoids one eval); computed if omitted.
    Returns (x', v', U', g', steps_taken) where steps_taken counts the
    unmasked (algorithmic) integrator steps per chain.
    """
    eps = jnp.asarray(epsilon, x.dtype)
    m_i = num_steps_per_chain

    def body(carry, i):
        x, v, g, u = carry
        active = (i < m_i)[None, :]
        v_half = v - 0.5 * eps * g
        x_new = x + eps * v_half
        u_new, g_new = potential_and_grad(x_new)
        v_new = v_half - 0.5 * eps * g_new
        x = jnp.where(active, x_new, x)
        v = jnp.where(active, v_new, v)
        g = jnp.where(active, g_new, g)
        u = jnp.where(active[0], u_new, u)
        return (x, v, g, u), None

    if u0 is None:
        u0 = potential_and_grad(x)[0]  # needed for frozen chains' U
    (x_f, v_f, g_f, u_f), _ = lax.scan(
        body,
        (x, v, grad, u0),
        jnp.arange(num_steps_max),
        unroll=unroll,
    )
    steps = jnp.minimum(m_i, num_steps_max).astype(jnp.int32)
    return x_f, v_f, u_f, g_f, steps


def kinetic_energy(v: Array, inv_mass: Array | None = None) -> Array:
    """½vᵀM⁻¹v per chain: (..., ndims, nbatch) → (..., nbatch).

    Rank-polymorphic (reduces the second-to-last axis) so stacked batches —
    e.g. MJHMC's fused forward/backward pair stacked on a leading axis —
    keep the chain axis last and therefore keep its mesh sharding aligned
    (no collectives materialize in the hot loop; see tests/test_collectives).
    """
    vv = v * v if inv_mass is None else v * v * inv_mass
    return 0.5 * jnp.sum(vv, axis=-2)


def total_energy(u: Array, v: Array, inv_mass: Array | None = None) -> Array:
    """H(ζ) = U(x) + ½vᵀM⁻¹v."""
    return u + kinetic_energy(v, inv_mass)


def momentum_scale(inv_mass: Array | None) -> Array | float:
    """√M multiplier turning N(0, I) draws into N(0, M) momenta."""
    if inv_mass is None:
        return 1.0
    return jnp.sqrt(1.0 / inv_mass)
