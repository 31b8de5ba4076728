"""Product-of-t experts — heavy-tailed benchmark.

Reference behavior (SURVEY.md §2.2c): U(x) = Σᵢ (ν+1)/2 · log(1 + yᵢ²/ν)
with y = Wᵀx over a random basis W (~36 dims/experts), originally
Theano-compiled. Here the basis contraction is a plain matmul that XLA maps
onto the MXU; the TPU-native analogue of "Theano-compiled energy graph" is
"XLA-compiled fused energy kernel" (SURVEY.md §2 note).

BASELINE config 3 pairs this with MJHMC + NUTS and step-size adaptation.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.models.base import Distribution, register

Array = jax.Array


@register("product_of_t")
@dataclasses.dataclass(frozen=True)
class ProductOfT(Distribution):
    """Heavy-tailed product of Student-t experts over a fixed random basis.

    The basis is drawn once from a seeded host RNG: a random rotation with
    mildly log-spaced singular values, so the energy is anisotropic but
    well-defined and reproducible without a shipped data file.
    """

    ndims: int = 36
    nbasis: int = 36
    nu: float = 2.5
    basis_seed: int = 0
    basis_conditioning: float = 1.0  # log10 spread of singular values

    @functools.cached_property
    def _basis(self) -> np.ndarray:
        """W: (ndims, nbasis), float32."""
        rng = np.random.default_rng(self.basis_seed)
        a = rng.standard_normal((self.ndims, self.nbasis))
        u, _, vt = np.linalg.svd(a, full_matrices=False)
        k = min(self.ndims, self.nbasis)
        s = 10.0 ** np.linspace(0.0, self.basis_conditioning, k)
        return (u * s) @ vt

    @property
    def basis(self) -> Array:
        return jnp.asarray(self._basis, jnp.float32)

    def potential(self, x: Array) -> Array:
        w = self.basis
        y = jnp.einsum("dk,...dn->...kn", w, x, preferred_element_type=jnp.float32)
        nu = self.nu
        return 0.5 * (nu + 1.0) * jnp.sum(jnp.log1p(y * y / nu), axis=-2)

    def potential_and_grad(self, x: Array):
        w = self.basis
        y = jnp.einsum("dk,...dn->...kn", w, x, preferred_element_type=jnp.float32)
        nu = self.nu
        u = 0.5 * (nu + 1.0) * jnp.sum(jnp.log1p(y * y / nu), axis=-2)
        # dU/dy_i = (nu+1) * y_i / (nu + y_i^2);  dU/dx = W @ dU/dy
        dudy = (nu + 1.0) * y / (nu + y * y)
        g = jnp.einsum("dk,...kn->...dn", w, dudy, preferred_element_type=jnp.float32)
        return u, g

    def init_x(self, key: Array, nbatch: int) -> Array:
        # t-ish start: normal scaled up to cover the heavy tails a bit
        return 2.0 * jax.random.normal(key, (self.ndims, nbatch), jnp.float32)

    def analytic_mean(self):
        return jnp.zeros(self.ndims, jnp.float32)

    def analytic_var(self):
        """Exact covariance diag when W is square invertible and ν > 2.

        y = Wᵀx are independent Student-t(ν) scaled to unit scale, each with
        variance ν/(ν-2); x = W⁻ᵀ y, so cov(x) = W⁻ᵀ diag(ν/(ν-2)) W⁻¹.
        """
        if self.ndims != self.nbasis or self.nu <= 2.0:
            return None
        winv = np.linalg.inv(self._basis.astype(np.float64))
        vy = self.nu / (self.nu - 2.0)
        cov = winv.T @ (vy * np.eye(self.ndims)) @ winv
        return jnp.asarray(np.diag(cov), jnp.float32)
