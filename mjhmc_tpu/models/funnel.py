"""Neal's funnel — the varying-curvature benchmark.

Beyond the reference's four energies (SURVEY.md §2.2): the canonical
stress test for step-size adaptation and mass-matrix preconditioning
(Neal 2003, "Slice sampling", §8). A single global scale ``v`` sets the
variance of every other coordinate, so the posterior curvature varies by
orders of magnitude across the support — fixed-step HMC either diverges
in the neck or mixes glacially in the mouth. Exact marginals make it a
closed-form stationarity oracle like the reference's Gaussian
(SURVEY.md §4.3):

    v ~ N(0, σ_v²),   x_i | v ~ N(0, eᵛ)   for i = 1..d-1

    U(x) = v²/(2σ_v²) + (d−1)/2 · v + e⁻ᵛ/2 · Σᵢ xᵢ²

Rank-polymorphic like every energy here: reductions happen on axis=-2 so
the chain axis stays last and keeps its mesh sharding
(tests/test_collectives invariant).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from mjhmc_tpu.models.base import Distribution, register

Array = jax.Array


@register("funnel")
@dataclasses.dataclass(frozen=True)
class Funnel(Distribution):
    """Neal's funnel: coordinate 0 is the log-scale ``v``, the remaining
    ``ndims − 1`` coordinates are N(0, eᵛ)."""

    ndims: int = 10
    sigma_v: float = 3.0

    def potential(self, x: Array) -> Array:
        v = x[..., 0, :]
        z2 = jnp.sum(x[..., 1:, :] ** 2, axis=-2)
        d1 = self.ndims - 1
        return (
            0.5 * v * v / (self.sigma_v**2)
            + 0.5 * d1 * v
            + 0.5 * jnp.exp(-v) * z2
        )

    def potential_and_grad(self, x: Array):
        v = x[..., 0, :]
        z = x[..., 1:, :]
        z2 = jnp.sum(z * z, axis=-2)
        e = jnp.exp(-v)
        d1 = self.ndims - 1
        u = 0.5 * v * v / (self.sigma_v**2) + 0.5 * d1 * v + 0.5 * e * z2
        gv = v / (self.sigma_v**2) + 0.5 * d1 - 0.5 * e * z2
        gz = e[..., None, :] * z
        return u, jnp.concatenate([gv[..., None, :], gz], axis=-2)

    def init_x(self, key: Array, nbatch: int) -> Array:
        """Exact draws: v first, then x_i = e^{v/2}·N(0,1)."""
        k_v, k_z = jax.random.split(key)
        v = self.sigma_v * jax.random.normal(k_v, (1, nbatch), jnp.float32)
        z = jnp.exp(0.5 * v) * jax.random.normal(
            k_z, (self.ndims - 1, nbatch), jnp.float32
        )
        return jnp.concatenate([v, z], axis=0)

    def analytic_mean(self) -> Array:
        return jnp.zeros(self.ndims, jnp.float32)

    def analytic_var(self) -> Array:
        """Var[v] = σ_v²; Var[x_i] = E[eᵛ] = exp(σ_v²/2)."""
        vz = math.exp(0.5 * self.sigma_v**2)
        return jnp.asarray(
            [self.sigma_v**2] + [vz] * (self.ndims - 1), jnp.float32
        )
