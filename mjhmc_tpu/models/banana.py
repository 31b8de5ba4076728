"""Twisted-Gaussian "banana" — the curved-ridge benchmark.

Beyond the reference's four energies (SURVEY.md §2.2): the Haario et al.
(1999) banana, the standard target for samplers on strongly curved,
non-axis-aligned ridges. It is an exact pushforward of a Gaussian, so
every moment is closed-form and exact initial draws are one transform —
a stationarity oracle in the same spirit as the reference's Gaussian
(SURVEY.md §4.3):

    x₁ ~ N(0, a²),   x₂ | x₁ ~ N(b·(x₁² − a²), 1),   xᵢ ~ N(0,1) for i ≥ 3

    U(x) = x₁²/(2a²) + ½·(x₂ − b(x₁² − a²))² + ½·Σ_{i≥3} xᵢ²

Rank-polymorphic: reductions on axis=-2, chain axis last
(tests/test_collectives invariant).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mjhmc_tpu.models.base import Distribution, register

Array = jax.Array


@register("banana")
@dataclasses.dataclass(frozen=True)
class Banana(Distribution):
    """Haario banana: ``a`` sets the ridge length, ``b`` its curvature."""

    ndims: int = 2
    a: float = 2.0
    b: float = 0.4

    def _parts(self, x: Array):
        x1 = x[..., 0, :]
        x2 = x[..., 1, :]
        r = x2 - self.b * (x1 * x1 - self.a**2)
        return x1, r

    def potential(self, x: Array) -> Array:
        x1, r = self._parts(x)
        u = 0.5 * x1 * x1 / (self.a**2) + 0.5 * r * r
        if self.ndims > 2:
            u = u + 0.5 * jnp.sum(x[..., 2:, :] ** 2, axis=-2)
        return u

    def potential_and_grad(self, x: Array):
        x1, r = self._parts(x)
        u = 0.5 * x1 * x1 / (self.a**2) + 0.5 * r * r
        g1 = x1 / (self.a**2) - 2.0 * self.b * x1 * r
        parts = [g1[..., None, :], r[..., None, :]]
        if self.ndims > 2:
            tail = x[..., 2:, :]
            u = u + 0.5 * jnp.sum(tail * tail, axis=-2)
            parts.append(tail)
        return u, jnp.concatenate(parts, axis=-2)

    def init_x(self, key: Array, nbatch: int) -> Array:
        """Exact draws via the defining pushforward."""
        z = jax.random.normal(key, (self.ndims, nbatch), jnp.float32)
        x1 = self.a * z[0]
        x2 = z[1] + self.b * (x1 * x1 - self.a**2)
        return jnp.concatenate(
            [x1[None], x2[None], z[2:]], axis=0
        )

    def analytic_mean(self) -> Array:
        return jnp.zeros(self.ndims, jnp.float32)

    def analytic_var(self) -> Array:
        """Var[x₁] = a²; Var[x₂] = 1 + b²·Var[x₁²] = 1 + 2b²a⁴."""
        v2 = 1.0 + 2.0 * self.b**2 * self.a**4
        return jnp.asarray(
            [self.a**2, v2] + [1.0] * (self.ndims - 2), jnp.float32
        )
