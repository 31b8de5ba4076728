"""Distribution library tests: fused gradients vs AD, shapes, oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjhmc_tpu.models import (
    Banana,
    Funnel,
    Gaussian,
    LogisticRegression,
    ProductOfT,
    RoughWell,
    SparseCoding,
    registry,
)


ALL_DISTS = [
    Gaussian(ndims=2, log_conditioning=2.0),
    Gaussian(ndims=50, log_conditioning=4.0),
    RoughWell(ndims=2),
    ProductOfT(ndims=36, nbasis=36),
    SparseCoding(npixels=64, nbasis=128),
    Funnel(ndims=10),
    Banana(ndims=3),
    LogisticRegression(ndims=16, nobs=256),
]


@pytest.mark.parametrize("dist", ALL_DISTS, ids=lambda d: d.name + str(d.ndims))
def test_shapes(dist):
    key = jax.random.key(0)
    x = dist.init_x(key, 7)
    assert x.shape == (dist.ndims, 7)
    u = dist.potential(x)
    assert u.shape == (7,)
    u2, g = dist.potential_and_grad(x)
    assert g.shape == x.shape
    np.testing.assert_allclose(u, u2, rtol=1e-5)


@pytest.mark.parametrize("dist", ALL_DISTS, ids=lambda d: d.name + str(d.ndims))
def test_fused_grad_matches_autodiff(dist):
    """Analytic fused gradients must equal jax.grad of the potential."""
    key = jax.random.key(1)
    x = dist.init_x(key, 5)
    _, g_fused = dist.potential_and_grad(x)
    g_ad = jax.grad(lambda y: dist.potential(y).sum())(x)
    # normalize by gradient scale: fp32 matmul accumulation order differs
    # between the analytic form and the VJP (sparse-coding grads are O(100))
    scale = float(jnp.max(jnp.abs(g_ad))) + 1e-6
    np.testing.assert_allclose(g_fused / scale, g_ad / scale, atol=3e-3)


def test_gaussian_conditioning():
    d = Gaussian(ndims=5, log_conditioning=4.0)
    v = d.variances
    assert np.isclose(v[-1] / v[0], 1e4, rtol=1e-5)


def test_gaussian_analytic_moments_selfconsistent():
    d = Gaussian(ndims=3, log_conditioning=1.0)
    key = jax.random.key(2)
    x = d.init_x(key, 200_000)
    emp_var = np.var(np.asarray(x), axis=1)
    np.testing.assert_allclose(emp_var, d.analytic_var(), rtol=0.05)


def test_product_of_t_analytic_var():
    d = ProductOfT(ndims=8, nbasis=8, nu=4.0)
    v = d.analytic_var()
    assert v is not None and v.shape == (8,)
    # direct MC check: y_i iid t_nu scaled, x = W^-T y
    rng = np.random.default_rng(0)
    y = rng.standard_t(4.0, size=(8, 400_000))
    x = np.linalg.inv(np.asarray(d._basis, np.float64)).T @ y
    np.testing.assert_allclose(np.var(x, axis=1), v, rtol=0.1)


def test_rough_well_quadrature_var():
    d = RoughWell(ndims=2)
    v = d.analytic_var()
    # ripples are a small perturbation of the scale1^2 well
    assert 0.5 * d.scale1**2 < float(v[0]) < 2.0 * d.scale1**2


def test_reference_api_aliases():
    """E / dEdX / init_X aliases (the reference's public surface)."""
    d = Gaussian(ndims=3, log_conditioning=1.0)
    key = jax.random.key(0)
    x = d.init_X(key, 5)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(d.init_x(key, 5)))
    np.testing.assert_allclose(np.asarray(d.E(x)), np.asarray(d.potential(x)))
    np.testing.assert_allclose(
        np.asarray(d.dEdX(x)), np.asarray(d.grad_potential(x))
    )


def test_sparse_coding_custom_patch():
    import numpy as np
    from mjhmc_tpu.models import SparseCoding

    patch = np.linspace(-1, 1, 64)
    d = SparseCoding.with_patch(patch, nbasis=32)
    assert d.npixels == 64 and d.ndims == 32
    np.testing.assert_allclose(np.asarray(d.patch).ravel(), patch, rtol=1e-6)
    x = d.init_x(jax.random.key(0), 4)
    u, g = d.potential_and_grad(x)
    assert np.isfinite(np.asarray(u)).all()
    # different patch ⇒ different posterior hash
    assert d.stable_hash() != SparseCoding(npixels=64, nbasis=32).stable_hash()


def test_registry():
    names = set(registry())
    assert {"gaussian", "rough_well", "product_of_t", "sparse_coding"} <= names


def test_stable_hash_distinguishes_configs():
    a = Gaussian(ndims=2, log_conditioning=2.0)
    b = Gaussian(ndims=2, log_conditioning=3.0)
    assert a.stable_hash() != b.stable_hash()
    assert a.stable_hash() == Gaussian(ndims=2, log_conditioning=2.0).stable_hash()
