"""Rough well — the paper's headline benchmark distribution.

Reference behavior (SURVEY.md §2.2b, arXiv:1509.03808 §"rough well"):
a smooth broad quadratic well overlaid with high-frequency cosine ripples,

    U(x) = Σᵢ [ xᵢ²/(2·scale1²) + cos(xᵢ/scale2) ]

with scale1 ≈ 100, scale2 ≈ 4, in 2-D (BASELINE config 2: 10k vmapped
chains, the ≥1M-leapfrog-steps/sec/chip target).

The marginal is 1-D and numerically integrable, so quadrature moments serve
as a test oracle (SURVEY.md §4.3).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.models.base import Distribution, register

Array = jax.Array


@register("rough_well")
@dataclasses.dataclass(frozen=True)
class RoughWell(Distribution):
    """``amplitude`` scales the ripple height (reference spec: 1.0).

    Barrier heights are 2·amplitude in units of kT; amplitude ≳ 2 puts the
    samplers in the high-rejection "rough" regime where the jump process's
    per-grad-eval advantage over discrete HMC manifests (see
    tests/test_efficiency.py and the ladder analysis in docs/DESIGN.md).
    """

    ndims: int = 2
    scale1: float = 100.0
    scale2: float = 4.0
    amplitude: float = 1.0

    def potential(self, x: Array) -> Array:
        s1, s2 = self.scale1, self.scale2
        return jnp.sum(x * x, axis=-2) / (2.0 * s1 * s1) + self.amplitude * jnp.sum(
            jnp.cos(x / s2), axis=-2
        )

    def potential_and_grad(self, x: Array):
        s1, s2 = self.scale1, self.scale2
        inv_s1sq = 1.0 / (s1 * s1)
        c = jnp.cos(x / s2)
        u = 0.5 * inv_s1sq * jnp.sum(x * x, axis=-2) + self.amplitude * jnp.sum(
            c, axis=-2
        )
        g = x * inv_s1sq - self.amplitude * jnp.sin(x / s2) / s2
        return u, g

    def init_x(self, key: Array, nbatch: int) -> Array:
        return self.scale1 * jax.random.normal(
            key, (self.ndims, nbatch), jnp.float32
        )

    def analytic_mean(self):
        return jnp.zeros(self.ndims, jnp.float32)

    def analytic_var(self):
        """Marginal variance by 1-D quadrature (host-side, NumPy)."""
        s1, s2 = self.scale1, self.scale2
        xs = np.linspace(-8 * s1, 8 * s1, 200_001)
        u = xs**2 / (2 * s1**2) + self.amplitude * np.cos(xs / s2)
        w = np.exp(-(u - u.min()))
        var = np.sum(w * xs**2) / np.sum(w)
        return jnp.full(self.ndims, np.float32(var))
