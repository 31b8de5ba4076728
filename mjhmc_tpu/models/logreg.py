"""Bayesian logistic regression — the real-inference benchmark.

Beyond the reference's four energies (SURVEY.md §2.2): a log-concave
posterior over regression weights under a Gaussian prior, the canonical
"does the framework do real Bayesian inference" target. The design
matrix / labels are synthesized once from a seeded host RNG (the same
no-shipped-data-file policy as ``SparseCoding``); the likelihood is a
single (nobs × ndims) matmul that XLA maps onto the MXU, exactly like
the reference's Theano-compiled energies became XLA fusions
(SURVEY.md §2 note).

    U(θ) = Σ_o softplus(−s_o·(Xθ)_o) + ‖θ‖²/(2σ₀²),   s_o ∈ {−1, +1}

Log-concavity gives a usable oracle without closed-form moments: the
posterior is well-approximated by its Laplace expansion at the MAP, so
``map_estimate()`` / ``laplace_var()`` serve as test references with
loose tolerances (tests/test_distributions.py).

Rank-polymorphic: the observation reduction rides a new axis before the
state axis; chain axis stays last (tests/test_collectives invariant).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.models.base import Distribution, register

Array = jax.Array


@register("logreg")
@dataclasses.dataclass(frozen=True)
class LogisticRegression(Distribution):
    """Synthetic-data Bayesian logistic regression posterior."""

    ndims: int = 16  # number of features / weights
    nobs: int = 256
    prior_scale: float = 5.0
    data_seed: int = 0

    @functools.cached_property
    def _data(self) -> tuple[np.ndarray, np.ndarray]:
        """(X: (nobs, ndims), s: (nobs,) in {−1,+1}) from a seeded RNG."""
        rng = np.random.default_rng(self.data_seed)
        xmat = rng.standard_normal((self.nobs, self.ndims)).astype(np.float32)
        xmat /= np.sqrt(self.ndims)
        theta_true = 2.0 * rng.standard_normal(self.ndims)
        p = 1.0 / (1.0 + np.exp(-(xmat @ theta_true)))
        s = np.where(rng.uniform(size=self.nobs) < p, 1.0, -1.0)
        return xmat, s.astype(np.float32)

    @property
    def design(self) -> Array:
        return jnp.asarray(self._data[0])

    @property
    def signs(self) -> Array:
        return jnp.asarray(self._data[1])

    def potential(self, x: Array) -> Array:
        xmat, s = self.design, self.signs
        logits = jnp.einsum(
            "od,...dn->...on", xmat, x, preferred_element_type=jnp.float32
        )
        nll = jnp.sum(jax.nn.softplus(-s[:, None] * logits), axis=-2)
        prior = 0.5 * jnp.sum(x * x, axis=-2) / (self.prior_scale**2)
        return nll + prior

    def potential_and_grad(self, x: Array):
        xmat, s = self.design, self.signs
        logits = jnp.einsum(
            "od,...dn->...on", xmat, x, preferred_element_type=jnp.float32
        )
        z = -s[:, None] * logits
        u = jnp.sum(jax.nn.softplus(z), axis=-2) + 0.5 * jnp.sum(
            x * x, axis=-2
        ) / (self.prior_scale**2)
        # d softplus(z)/d logits = −s·sigmoid(z)
        dl = -s[:, None] * jax.nn.sigmoid(z)
        g = jnp.einsum(
            "od,...on->...dn", xmat, dl, preferred_element_type=jnp.float32
        ) + x / (self.prior_scale**2)
        return u, g

    def init_x(self, key: Array, nbatch: int) -> Array:
        return jax.random.normal(key, (self.ndims, nbatch), jnp.float32)

    # ------------------------------------------------------ Laplace oracle
    def map_estimate(self, iters: int = 30) -> np.ndarray:
        """MAP via damped Newton on the host (the posterior is log-concave,
        so this converges quadratically); float64 for a tight oracle."""
        xmat = self._data[0].astype(np.float64)
        s = self._data[1].astype(np.float64)
        lam = 1.0 / self.prior_scale**2
        theta = np.zeros(self.ndims)
        for _ in range(iters):
            logits = xmat @ theta
            p = 1.0 / (1.0 + np.exp(s * logits))  # sigmoid(−s·logits)
            grad = -(xmat.T @ (s * p)) + lam * theta
            w = p * (1.0 - p)
            hess = (xmat.T * w) @ xmat + lam * np.eye(self.ndims)
            step = np.linalg.solve(hess, grad)
            theta = theta - step
            if np.max(np.abs(step)) < 1e-12:
                break
        return theta

    def laplace_var(self) -> np.ndarray:
        """Diagonal of the inverse Hessian at the MAP — an approximate
        posterior-variance oracle (log-concave target ⇒ close for this
        data size; tests use loose tolerances)."""
        xmat = self._data[0].astype(np.float64)
        s = self._data[1].astype(np.float64)
        lam = 1.0 / self.prior_scale**2
        theta = self.map_estimate()
        logits = xmat @ theta
        p = 1.0 / (1.0 + np.exp(s * logits))
        w = p * (1.0 - p)
        hess = (xmat.T * w) @ xmat + lam * np.eye(self.ndims)
        return np.diag(np.linalg.inv(hess))
