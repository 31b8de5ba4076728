"""Anisotropic / ill-conditioned diagonal Gaussian.

Reference behavior (SURVEY.md §2.2a): quadratic energy with diagonal
covariance whose eigenvalues are log-spaced; ill-conditioning set by
``log_conditioning``. Used as the 2-D anisotropic benchmark (BASELINE
config 1) and the 50-D ill-conditioned benchmark (config 4).

Analytic moments make this the primary stationarity test oracle
(SURVEY.md §4.3).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.models.base import Distribution, register

Array = jax.Array


@register("gaussian")
@dataclasses.dataclass(frozen=True)
class Gaussian(Distribution):
    """U(x) = ½ Σᵢ xᵢ²/σᵢ² with log-spaced variances.

    ``σᵢ² = 10^(log_conditioning · i/(ndims-1))`` — condition number of the
    covariance is ``10^log_conditioning``. ``log_conditioning=0`` gives an
    isotropic standard normal.
    """

    ndims: int = 2
    log_conditioning: float = 2.0

    @property
    def variances(self) -> np.ndarray:
        if self.ndims == 1:
            return np.ones(1, np.float32)
        expo = np.linspace(0.0, self.log_conditioning, self.ndims)
        return (10.0 ** expo).astype(np.float32)

    def _prec(self) -> Array:
        # (ndims, 1) inverse variances, broadcast over the chain axis
        return jnp.asarray(1.0 / self.variances)[:, None]

    def potential(self, x: Array) -> Array:
        return 0.5 * jnp.sum(x * x * self._prec(), axis=-2)

    def potential_and_grad(self, x: Array):
        g = x * self._prec()
        return 0.5 * jnp.sum(x * g, axis=-2), g

    def init_x(self, key: Array, nbatch: int) -> Array:
        std = jnp.sqrt(jnp.asarray(self.variances))[:, None]
        return std * jax.random.normal(key, (self.ndims, nbatch), jnp.float32)

    def analytic_mean(self):
        return jnp.zeros(self.ndims, jnp.float32)

    def analytic_var(self):
        return jnp.asarray(self.variances)
