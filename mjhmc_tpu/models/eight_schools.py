"""Eight-schools hierarchical posterior — the canonical shrinkage target.

Beyond the reference's four energies (SURVEY.md §2.2): Rubin's eight-schools
meta-analysis (BDA §5.5) is *the* standard hierarchical benchmark — a
centered parameterization couples a global scale to every group effect, so
it exhibits the funnel pathology on real data and stresses warmup,
preconditioning, and NUTS exactly the way practitioners hit it.

State layout (rows of the (ndims, nbatch) array): row 0 is the population
mean ``μ``, row 1 the log population scale ``ℓ = log τ`` (sampled
unconstrained; the Jacobian of τ = eˡ is folded into the energy), rows
2..K+1 the school effects ``θⱼ``:

    μ ~ N(0, m₀²),   ℓ ~ N(0, s₀²),   θⱼ | μ, ℓ ~ N(μ, e²ˡ),
    yⱼ | θⱼ ~ N(θⱼ, σⱼ²)                       (yⱼ, σⱼ known data)

    U(x) = μ²/(2m₀²) + ℓ²/(2s₀²) + K·ℓ + e⁻²ˡ/2 Σⱼ(θⱼ−μ)²
         + Σⱼ (θⱼ−yⱼ)²/(2σⱼ²)

**Exact oracle:** the θⱼ are conditionally Gaussian, so they integrate out
analytically — ``yⱼ | μ, ℓ ~ N(μ, σⱼ² + e²ˡ)`` — leaving a 2-D marginal
p(μ, ℓ) that a dense quadrature grid evaluates to float64 accuracy. All
first/second posterior moments (including every θⱼ, via the conditional
Gaussian) follow from that grid: the same closed-form-oracle test strategy
as the reference-era Gaussians (SURVEY.md §4.3), but on a genuinely
hierarchical posterior.

Rank-polymorphic like every energy here: reductions on axis=-2, chain axis
last (tests/test_collectives invariant).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.models.base import Distribution, register

Array = jax.Array

# Rubin (1981) / BDA table 5.2
_Y8 = (28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0)
_SIGMA8 = (15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0)


@register("eight_schools")
@dataclasses.dataclass(frozen=True)
class EightSchools(Distribution):
    """Eight-schools posterior over (μ, log τ, group rows).

    ``parameterization``:
      - ``"centered"``: group rows are θⱼ themselves — the funnel-on-data
        pathology (fixed-step samplers visibly underexplore the τ→0 neck;
        the quadrature oracle quantifies exactly how much).
      - ``"noncentered"``: group rows are zⱼ with θⱼ = μ + eˡ·zⱼ — the
        standard reparameterization fix; well-conditioned, samplers match
        the oracle tightly. Both share the same exact oracle (the grid
        moments are transformed per parameterization).
    """

    y: tuple = _Y8
    sigma: tuple = _SIGMA8
    mu_scale: float = 25.0
    log_tau_scale: float = 1.5
    parameterization: str = "centered"

    @property
    def ndims(self) -> int:  # type: ignore[override]
        return 2 + len(self.y)

    @property
    def nschools(self) -> int:
        return len(self.y)

    def _consts(self):
        y = jnp.asarray(self.y, jnp.float32)[:, None]
        inv_sig2 = jnp.asarray(
            1.0 / np.asarray(self.sigma, np.float64) ** 2, jnp.float32
        )[:, None]
        return y, inv_sig2

    def potential(self, x: Array) -> Array:
        mu = x[..., 0, :]
        l = x[..., 1, :]
        g = x[..., 2:, :]
        y, inv_sig2 = self._consts()
        k = self.nschools
        prior = (
            0.5 * mu * mu / self.mu_scale**2
            + 0.5 * l * l / self.log_tau_scale**2
        )
        if self.parameterization == "centered":
            dth = g - mu[..., None, :]
            return (
                prior
                + k * l
                + 0.5 * jnp.exp(-2.0 * l) * jnp.sum(dth * dth, axis=-2)
                + 0.5 * jnp.sum((g - y) ** 2 * inv_sig2, axis=-2)
            )
        r = mu[..., None, :] + jnp.exp(l)[..., None, :] * g - y
        return (
            prior
            + 0.5 * jnp.sum(g * g, axis=-2)
            + 0.5 * jnp.sum(r * r * inv_sig2, axis=-2)
        )

    def potential_and_grad(self, x: Array):
        mu = x[..., 0, :]
        l = x[..., 1, :]
        g = x[..., 2:, :]
        y, inv_sig2 = self._consts()
        k = self.nschools
        prior = (
            0.5 * mu * mu / self.mu_scale**2
            + 0.5 * l * l / self.log_tau_scale**2
        )
        if self.parameterization == "centered":
            e2 = jnp.exp(-2.0 * l)
            dth = g - mu[..., None, :]
            s1 = jnp.sum(dth, axis=-2)
            s2 = jnp.sum(dth * dth, axis=-2)
            r = g - y
            u = prior + k * l + 0.5 * e2 * s2 + 0.5 * jnp.sum(
                r * r * inv_sig2, axis=-2
            )
            gmu = mu / self.mu_scale**2 - e2 * s1
            gl = l / self.log_tau_scale**2 + k - e2 * s2
            gth = e2[..., None, :] * dth + r * inv_sig2
            grad = jnp.concatenate(
                [gmu[..., None, :], gl[..., None, :], gth], axis=-2
            )
            return u, grad
        e = jnp.exp(l)[..., None, :]
        r = mu[..., None, :] + e * g - y
        ri = r * inv_sig2
        u = prior + 0.5 * jnp.sum(g * g, axis=-2) + 0.5 * jnp.sum(
            r * ri, axis=-2
        )
        gmu = mu / self.mu_scale**2 + jnp.sum(ri, axis=-2)
        gl = l / self.log_tau_scale**2 + jnp.sum(e * g * ri, axis=-2)
        gz = g + e * ri
        grad = jnp.concatenate(
            [gmu[..., None, :], gl[..., None, :], gz], axis=-2
        )
        return u, grad

    def init_x(self, key: Array, nbatch: int) -> Array:
        """Hierarchy-shaped overdispersed init: draw (μ, ℓ) near the data
        scale, group rows from their conditional prior."""
        k_m, k_l, k_t = jax.random.split(key, 3)
        ybar = float(np.mean(self.y))
        mu = ybar + 8.0 * jax.random.normal(k_m, (1, nbatch), jnp.float32)
        l = jax.random.normal(k_l, (1, nbatch), jnp.float32)
        z = jax.random.normal(k_t, (self.nschools, nbatch), jnp.float32)
        g = mu + jnp.exp(l) * z if self.parameterization == "centered" else z
        return jnp.concatenate([mu, l, g], axis=0)

    # ---------------------------------------------------------------- oracle
    def analytic_mean(self) -> Array:
        return jnp.asarray(_quad_moments(self)[0], jnp.float32)

    def analytic_var(self) -> Array:
        return jnp.asarray(_quad_moments(self)[1], jnp.float32)

    def exact_sample(self, seed: int, n: int) -> np.ndarray:
        """Exact posterior draws (NumPy, host-side — a test/init oracle,
        not jittable): categorical draw of a (μ, ℓ) grid cell under the
        analytically marginalized posterior + in-cell jitter, then group
        rows from their conditional Gaussian."""
        grid = _quad_grid(self)
        rng = np.random.default_rng(seed)
        idx = rng.choice(grid.w.size, size=n, p=grid.w.ravel())
        mi, li = np.unravel_index(idx, grid.w.shape)
        mus = grid.mu[mi] + rng.uniform(-0.5, 0.5, n) * grid.dmu
        ls = grid.ell[li] + rng.uniform(-0.5, 0.5, n) * grid.dell
        tau2 = np.exp(2.0 * ls)
        sig2 = np.asarray(self.sigma, np.float64) ** 2
        yv = np.asarray(self.y, np.float64)
        rows = [mus, ls]
        for j in range(self.nschools):
            prec = 1.0 / sig2[j] + 1.0 / tau2
            mj = (yv[j] / sig2[j] + mus / tau2) / prec
            th = mj + rng.standard_normal(n) / np.sqrt(prec)
            rows.append(
                th
                if self.parameterization == "centered"
                else (th - mus) / np.sqrt(tau2)
            )
        return np.asarray(rows, np.float64)


@dataclasses.dataclass(frozen=True)
class _QuadGrid:
    mu: np.ndarray  # (n_mu,)
    ell: np.ndarray  # (n_ell,)
    w: np.ndarray  # (n_mu, n_ell) normalized posterior mass
    dmu: float
    dell: float


@functools.lru_cache(maxsize=8)
def _quad_grid(dist: EightSchools) -> _QuadGrid:
    """Dense grid over the analytically marginalized posterior p(μ, ℓ).

    θⱼ integrate out (conditionally Gaussian): yⱼ | μ, ℓ ~ N(μ, σⱼ²+e²ˡ).
    Grid spans ≥9 posterior SDs on both axes.
    """
    y = np.asarray(dist.y, np.float64)
    sig2 = np.asarray(dist.sigma, np.float64) ** 2
    mu = np.linspace(-40.0, 60.0, 601)
    ell = np.linspace(-8.0, 6.0, 561)
    m, le = np.meshgrid(mu, ell, indexing="ij")
    tau2 = np.exp(2.0 * le)
    logp = (
        -0.5 * m**2 / dist.mu_scale**2
        - 0.5 * le**2 / dist.log_tau_scale**2
    )
    for j in range(y.size):
        v = sig2[j] + tau2
        logp += -0.5 * np.log(v) - 0.5 * (y[j] - m) ** 2 / v
    w = np.exp(logp - logp.max())
    w /= w.sum()
    return _QuadGrid(mu, ell, w, float(mu[1] - mu[0]), float(ell[1] - ell[0]))


@functools.lru_cache(maxsize=8)
def _quad_moments(dist: EightSchools):
    """Float64 posterior moments of the *state rows* via the 2-D grid.

    Group-row moments come from the conditional Gaussian θⱼ | μ, ℓ, y ~
    N(mⱼ, vⱼ) averaged over the grid — transformed to zⱼ = (θⱼ−μ)/τ
    moments for the non-centered parameterization.
    """
    grid = _quad_grid(dist)
    y = np.asarray(dist.y, np.float64)
    sig2 = np.asarray(dist.sigma, np.float64) ** 2
    m, le = np.meshgrid(grid.mu, grid.ell, indexing="ij")
    tau2 = np.exp(2.0 * le)
    w = grid.w
    means = [(w * m).sum(), (w * le).sum()]
    ex2 = [(w * m**2).sum(), (w * le**2).sum()]
    centered = dist.parameterization == "centered"
    for j in range(y.size):
        prec = 1.0 / sig2[j] + 1.0 / tau2
        mj = (y[j] / sig2[j] + m / tau2) / prec
        vj = 1.0 / prec
        if not centered:  # zⱼ | μ, ℓ ~ N((mⱼ−μ)/τ, vⱼ/τ²)
            mj, vj = (mj - m) / np.sqrt(tau2), vj / tau2
        means.append((w * mj).sum())
        ex2.append((w * (mj**2 + vj)).sum())
    mean = np.asarray(means)
    var = np.asarray(ex2) - mean**2
    return mean, var
