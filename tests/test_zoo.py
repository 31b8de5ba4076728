"""Oracle tests for the beyond-reference model zoo (funnel, banana, logreg).

Each target ships its own exactness handle: the funnel and banana are
exact pushforwards of Gaussians (closed-form moments + exact init draws),
and logistic regression is log-concave (MAP/Laplace oracle). Same test
strategy as the reference-era Gaussian checks (SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.models import Banana, Funnel, LogisticRegression
from mjhmc_tpu.samplers import ControlHMC, MarkovJumpHMC


# ---------------------------------------------------------------- funnel
def test_funnel_exact_init_matches_analytic():
    d = Funnel(ndims=5, sigma_v=1.0)
    x = np.asarray(d.init_x(jax.random.key(0), 200_000))
    np.testing.assert_allclose(x.mean(axis=1), 0.0, atol=0.05)
    np.testing.assert_allclose(
        x.var(axis=1), np.asarray(d.analytic_var()), rtol=0.08
    )


def test_funnel_rank_polymorphic():
    d = Funnel(ndims=4)
    x = d.init_x(jax.random.key(1), 6)
    stacked = jnp.stack([x, 2.0 * x])  # (2, d, n)
    u = d.potential(stacked)
    assert u.shape == (2, 6)
    np.testing.assert_allclose(u[0], d.potential(x), rtol=1e-6)


def test_funnel_mjhmc_moments_mild():
    """MJHMC recovers the moments of a mild (σ_v=1) funnel."""
    d = Funnel(ndims=4, sigma_v=1.0)
    s = MarkovJumpHMC(
        d, epsilon=0.25, beta=0.2, num_leapfrog_steps=6, nbatch=512, seed=2
    )
    s.burn_in(200)
    out = s.sample(1200)
    xs = np.asarray(out["x"])  # (T, d, n)
    w = np.asarray(out["dwell"])[:, None, :]  # (T, 1, n)
    mean = (w * xs).sum(axis=(0, 2)) / w.sum()
    var = (w * (xs - mean[None, :, None]) ** 2).sum(axis=(0, 2)) / w.sum()
    tgt = np.asarray(d.analytic_var())
    np.testing.assert_allclose(mean, 0.0, atol=0.25)
    np.testing.assert_allclose(var, tgt, rtol=0.3)


# ---------------------------------------------------------------- banana
def test_banana_exact_init_matches_analytic():
    d = Banana(ndims=3, a=2.0, b=0.4)
    x = np.asarray(d.init_x(jax.random.key(3), 200_000))
    np.testing.assert_allclose(x.mean(axis=1), 0.0, atol=0.06)
    np.testing.assert_allclose(
        x.var(axis=1), np.asarray(d.analytic_var()), rtol=0.05
    )


def test_banana_hmc_moments():
    d = Banana(ndims=2, a=1.5, b=0.4)
    s = ControlHMC(
        d, epsilon=0.35, beta=0.3, num_leapfrog_steps=8, nbatch=512, seed=4
    )
    s.burn_in(300)
    out = s.sample(1500)
    xs = np.asarray(out["x"])
    tgt = np.asarray(d.analytic_var())
    np.testing.assert_allclose(xs.mean(axis=(0, 2)), 0.0, atol=0.3)
    np.testing.assert_allclose(xs.var(axis=(0, 2)), tgt, rtol=0.2)


# ---------------------------------------------------------------- logreg
def test_logreg_map_is_stationary():
    """The damped-Newton MAP zeroes the (float64) posterior gradient."""
    d = LogisticRegression(ndims=8, nobs=128)
    theta = d.map_estimate()
    x = jnp.asarray(theta, jnp.float32)[:, None]
    _, g = d.potential_and_grad(x)
    assert float(jnp.max(jnp.abs(g))) < 1e-3


def test_logreg_laplace_var_positive():
    d = LogisticRegression(ndims=8, nobs=128)
    v = d.laplace_var()
    assert v.shape == (8,)
    assert (v > 0).all()


def test_logreg_hmc_posterior_matches_laplace():
    """HMC mean ≈ MAP, variance ≈ Laplace diag (log-concave ⇒ near-Gaussian;
    loose tolerances absorb the skew)."""
    d = LogisticRegression(ndims=8, nobs=128)
    s = ControlHMC(
        d, epsilon=0.12, beta=0.3, num_leapfrog_steps=6, nbatch=256, seed=5
    )
    s.burn_in(300)
    out = s.sample(1200)
    xs = np.asarray(out["x"])
    mean = xs.mean(axis=(0, 2))
    var = xs.var(axis=(0, 2))
    theta_map = d.map_estimate()
    sd = np.sqrt(d.laplace_var())
    assert np.all(np.abs(mean - theta_map) < 0.5 * sd + 0.05)
    np.testing.assert_allclose(var, d.laplace_var(), rtol=0.35)
