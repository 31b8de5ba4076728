"""VI + SMC head tests with analytic Gaussian oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.models import Gaussian, ProductOfT
from mjhmc_tpu.inference import ADVI, SMC, advi_fit, systematic_resample
from mjhmc_tpu.inference.smc import smc_run


def test_advi_recovers_gaussian():
    """Mean-field ADVI on a diagonal Gaussian is exact: μ→0, σ→target."""
    dist = Gaussian(ndims=5, log_conditioning=1.0)
    params, elbos = jax.jit(
        lambda k: advi_fit(dist, k, num_steps=3000, n_mc=64, learning_rate=0.05)
    )(jax.random.key(0))
    tgt_std = np.sqrt(np.asarray(dist.analytic_var()))
    assert (np.abs(np.asarray(params.mu)) < 0.15 * tgt_std + 0.05).all()
    np.testing.assert_allclose(
        np.exp(np.asarray(params.omega)), tgt_std, rtol=0.15
    )
    # ELBO increased
    e = np.asarray(elbos)
    assert e[-100:].mean() > e[:100].mean()


def test_advi_wrapper():
    dist = Gaussian(ndims=3, log_conditioning=0.5)
    head = ADVI(dist, num_steps=1500)
    params, _ = head.fit()
    z = head.sample(1000)
    assert z.shape == (3, 1000)


def test_systematic_resample_unbiased():
    """Resampled ancestor counts ∝ weights."""
    key = jax.random.key(1)
    n = 10_000
    x = jnp.arange(n, dtype=jnp.float32)[None, :]
    log_w = jnp.log(jnp.arange(1, n + 1, dtype=jnp.float32))
    xr = systematic_resample(key, x, log_w)
    # top-weight particle should appear ~2x as often as the median one
    counts = np.bincount(np.asarray(xr[0]).astype(int), minlength=n)
    w = np.arange(1, n + 1) / np.sum(np.arange(1, n + 1))
    exp_counts = w * n
    # systematic resampling guarantees |count - expected| < 1
    assert np.abs(counts - exp_counts).max() <= 1.0 + 1e-6


def test_smc_gaussian_evidence_and_moments():
    """Gaussian prior → Gaussian target: log Z and moments are analytic."""
    dist = Gaussian(ndims=4, log_conditioning=1.0)
    prior_scale = 3.0
    state, trace = jax.jit(
        lambda k: smc_run(
            dist, k, num_particles=4096, num_stages=16,
            prior_scale=prior_scale, num_mutation_steps=5,
            num_leapfrog_steps=5,
        )
    )(jax.random.key(2))

    assert float(state.lam) == 1.0
    # log Z = log [ ∏ √(2π σi²) / (2π s²)^{d/2} ]
    var = np.asarray(dist.analytic_var(), np.float64)
    log_z_exact = 0.5 * np.sum(np.log(var)) - 0.5 * len(var) * np.log(
        prior_scale**2
    )
    assert abs(float(state.log_z) - log_z_exact) < 0.15, (
        float(state.log_z),
        log_z_exact,
    )
    x = np.asarray(state.x)
    np.testing.assert_allclose(x.mean(axis=1), 0.0, atol=0.2 * np.sqrt(var.max()))
    np.testing.assert_allclose(x.var(axis=1), var, rtol=0.15)


def test_smc_heavy_tailed_runs():
    dist = ProductOfT(ndims=8, nbasis=8, nu=4.0)
    head = SMC(dist, num_particles=2048, num_stages=12, seed=3)
    state, trace = head.run()
    assert float(state.lam) == 1.0
    assert np.isfinite(np.asarray(state.x)).all()
    lam_trace = np.asarray(trace["lam"])
    assert (np.diff(lam_trace) >= -1e-6).all()  # monotone annealing
