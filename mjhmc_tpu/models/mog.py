"""Mixture-of-Gaussians energy — the multimodal benchmark.

Goes beyond the reference's four benchmark energies (SURVEY.md §2.2): a
K-component isotropic Gaussian mixture whose well-separated modes defeat
single-temperature HMC/MJHMC (trajectories cannot tunnel through the
energy barrier), providing the test target for the parallel-tempering
sampler (``samplers/tempering.py``). Exact mixture moments make it a
closed-form stationarity oracle like the reference's Gaussian
(SURVEY.md §4.3).

U(x) = −log Σₖ wₖ (2πσₖ²)^(−d/2) exp(−‖x−μₖ‖²/(2σₖ²))

Rank-polymorphic like every energy here: the component reduction happens
on a new axis inserted *before* the state axis, so the chain axis stays
last and keeps its mesh sharding (tests/test_collectives invariant).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.models.base import Distribution, register

Array = jax.Array


@register("mog")
@dataclasses.dataclass(frozen=True)
class GaussianMixture(Distribution):
    """Isotropic K-component Gaussian mixture.

    ``means``: tuple of K length-``ndims`` tuples; ``scales``/``weights``:
    length-K tuples (weights are normalized internally). The default is the
    canonical hard two-mode 1-D target: modes at ±4 with σ = 0.8 — a
    ≈12.5 kT barrier between basins.
    """

    ndims: int = 1
    means: tuple = ((-4.0,), (4.0,))
    scales: tuple = (0.8, 0.8)
    weights: tuple = (0.5, 0.5)

    # ------------------------------------------------------------ parameters
    @property
    def _mu(self) -> np.ndarray:  # (K, ndims)
        return np.asarray(self.means, np.float32).reshape(len(self.scales), self.ndims)

    @property
    def _sigma(self) -> np.ndarray:  # (K,)
        return np.asarray(self.scales, np.float32)

    @property
    def _w(self) -> np.ndarray:  # (K,) normalized
        w = np.asarray(self.weights, np.float32)
        return w / w.sum()

    # ---------------------------------------------------------------- energy
    def _component_logits(self, x: Array) -> Array:
        """log[wₖ·Nₖ(x)] up to the global const: (..., d, n) → (..., K, n)."""
        mu = jnp.asarray(self._mu)[:, :, None]  # (K, d, 1)
        sig = jnp.asarray(self._sigma)[:, None]  # (K, 1)
        logw = jnp.log(jnp.asarray(self._w))[:, None]  # (K, 1)
        diff = x[..., None, :, :] - mu  # (..., K, d, n)
        sq = jnp.sum(diff * diff, axis=-2)  # (..., K, n)
        return logw - 0.5 * sq / (sig * sig) - self.ndims * jnp.log(sig)

    def potential(self, x: Array) -> Array:
        return -jax.nn.logsumexp(self._component_logits(x), axis=-2)

    def potential_and_grad(self, x: Array):
        """Fused U, dU/dx: dU/dx = Σₖ rₖ (x−μₖ)/σₖ² with responsibilities r."""
        logits = self._component_logits(x)  # (..., K, n)
        u = -jax.nn.logsumexp(logits, axis=-2)
        r = jax.nn.softmax(logits, axis=-2)  # (..., K, n)
        mu = jnp.asarray(self._mu)[:, :, None]  # (K, d, 1)
        inv_var = jnp.asarray(1.0 / (self._sigma**2))[:, None, None]  # (K, 1, 1)
        diff = x[..., None, :, :] - mu  # (..., K, d, n)
        g = jnp.sum(r[..., :, None, :] * diff * inv_var, axis=-3)  # (..., d, n)
        return u, g

    # ------------------------------------------------------------------ init
    def init_x(self, key: Array, nbatch: int) -> Array:
        """Exact mixture draws (component via categorical, then normal)."""
        k_c, k_n = jax.random.split(key)
        comp = jax.random.categorical(
            k_c, jnp.log(jnp.asarray(self._w)), shape=(nbatch,)
        )  # (n,)
        mu = jnp.asarray(self._mu)[comp].T  # (d, n)
        sig = jnp.asarray(self._sigma)[comp][None, :]  # (1, n)
        return mu + sig * jax.random.normal(k_n, (self.ndims, nbatch), jnp.float32)

    # ------------------------------------------------------------- metadata
    def analytic_mean(self) -> Array:
        return jnp.asarray(self._w @ self._mu)

    def analytic_var(self) -> Array:
        w, mu, sig = self._w, self._mu, self._sigma
        ex2 = w @ (mu * mu) + w @ (sig[:, None] ** 2 * np.ones_like(mu))
        m = w @ mu
        return jnp.asarray(ex2 - m * m)
