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
) -> Tuple[Array, Array, Array, Array]:
    """Run ``num_steps`` leapfrog steps of size ``epsilon``.

    Args:
      potential_and_grad: fused (U, dU/dx) over (ndims, nbatch) batches.
      x, v: positions and momenta, (ndims, nbatch).
      grad: dU/dx at the entry ``x`` (cached from the previous trajectory).
      epsilon: step size — scalar or (nbatch,) broadcastable over chains.
      num_steps: static trajectory length M.
      unroll: lax.scan unroll factor for the hot loop.

    Returns:
      (x', v', U(x'), dU/dx at x') after M steps; exactly M gradient evals.
    """
    eps = jnp.asarray(epsilon, x.dtype)

    def body(carry, _):
        x, v, g, _u = carry
        v_half = v - 0.5 * eps * g
        x_new = x + eps * v_half
        u_new, g_new = potential_and_grad(x_new)
        v_new = v_half - 0.5 * eps * g_new
        return (x_new, v_new, g_new, u_new), None

    # dummy initial U (overwritten by first step); num_steps >= 1 always
    u0 = jnp.zeros(x.shape[1:], x.dtype)
    (x_f, v_f, g_f, u_f), _ = lax.scan(
        body, (x, v, grad, u0), None, length=num_steps, unroll=unroll
    )
    return x_f, v_f, u_f, g_f


def kinetic_energy(v: Array) -> Array:
    """½‖v‖² per chain: (ndims, nbatch) → (nbatch,)."""
    return 0.5 * jnp.sum(v * v, axis=0)


def total_energy(u: Array, v: Array) -> Array:
    """H(ζ) = U(x) + ½‖v‖²."""
    return u + kinetic_energy(v)
