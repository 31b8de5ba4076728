"""Weighted-autocorrelation / ESS diagnostics tests (SURVEY.md §2.5)."""

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.diagnostics import (
    autocorrelation,
    autocorrelation_vs_grad_evals,
    effective_sample_size,
    weighted_autocorrelation,
)


def _direct_weighted_autocorr(x, w, nlags):
    """O(T²) reference implementation of the weighted autocovariance."""
    t, d, n = x.shape
    wx = w[:, None, :]
    mu = (wx * x).sum() / (d * wx.sum())  # per-dim mean is common here
    mu = (wx * x).sum(axis=(0, 2), keepdims=True) / wx.sum(axis=(0, 2), keepdims=True)
    xc = x - mu
    gamma = np.zeros(nlags)
    for tau in range(nlags):
        num = 0.0
        den = 0.0
        for t0 in range(t - tau):
            num += (w[t0] * w[t0 + tau] * (xc[t0] * xc[t0 + tau]).sum(axis=0)).sum()
            den += (w[t0] * w[t0 + tau]).sum() * d
        gamma[tau] = num / den
    return gamma / gamma[0]


def test_weighted_autocorr_matches_direct():
    rng = np.random.default_rng(0)
    t, d, n = 64, 2, 5
    x = rng.standard_normal((t, d, n)).astype(np.float32)
    # AR(1)-ish correlation in time
    for i in range(1, t):
        x[i] = 0.7 * x[i - 1] + 0.3 * x[i]
    w = rng.uniform(0.5, 2.0, (t, n)).astype(np.float32)
    rho_fft = np.asarray(weighted_autocorrelation(jnp.asarray(x), jnp.asarray(w), 16))
    rho_direct = _direct_weighted_autocorr(x, w, 16)
    np.testing.assert_allclose(rho_fft, rho_direct, atol=1e-4)


def test_unweighted_ar1_decay():
    """ρ(τ) of an AR(1) process ≈ φ^τ."""
    rng = np.random.default_rng(1)
    t, n, phi = 4096, 32, 0.8
    x = np.zeros((t, 1, n), np.float32)
    eps = rng.standard_normal((t, 1, n)) * np.sqrt(1 - phi**2)
    for i in range(1, t):
        x[i] = phi * x[i - 1] + eps[i]
    rho = np.asarray(autocorrelation(jnp.asarray(x), nlags=10))
    np.testing.assert_allclose(rho, phi ** np.arange(10), atol=0.05)


def test_ess_iid_near_full():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2048, 1, 8)).astype(np.float32))
    ess = float(effective_sample_size(x))
    total = 2048 * 8
    assert 0.5 * total < ess < 1.6 * total


def test_ess_correlated_much_smaller():
    rng = np.random.default_rng(3)
    t, n, phi = 2048, 8, 0.95
    x = np.zeros((t, 1, n), np.float32)
    eps = rng.standard_normal((t, 1, n)) * np.sqrt(1 - phi**2)
    for i in range(1, t):
        x[i] = phi * x[i - 1] + eps[i]
    ess = float(effective_sample_size(jnp.asarray(x)))
    total = t * n
    # AR(1) integrated autocorr time = (1+φ)/(1-φ) = 39
    assert ess < 0.1 * total


def test_grad_eval_axis():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((128, 1, 4)).astype(np.float32))
    evals, rho = autocorrelation_vs_grad_evals(x, grad_evals_per_step=10.0)
    assert evals.shape == rho.shape
    np.testing.assert_allclose(np.asarray(evals)[:3], [0.0, 10.0, 20.0])


def test_chunked_matches_single_shot():
    """Chain-chunked FFT accumulation (the HBM guard for long streamed
    runs) is exact: forcing tiny chunks reproduces the one-shot curve."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((256, 3, 40)).astype(np.float32))
    w = jnp.asarray(rng.random((256, 40)).astype(np.float32) + 0.1)
    full = weighted_autocorrelation(x, w, nlags=64)
    chunked = weighted_autocorrelation(x, w, nlags=64, max_fft_bytes=20_000)
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(full), rtol=1e-5, atol=1e-6
    )


def test_exact_cumulative_evals_axis():
    """The fairness axis aligns to the actual counter trajectory
    (SURVEY.md §3.3): constant-rate samplers give exactly k·rate; bursty
    counters give the averaged true eval distance, not a global mean rate."""
    from mjhmc_tpu.experiments.autocorr_experiment import _exact_evals_axis

    # constant per-step cost M=7 → axis is exactly k·7
    e = 7.0 * np.arange(1, 101)
    axis = _exact_evals_axis(e, nlags=20)
    np.testing.assert_allclose(axis, 7.0 * np.arange(20), rtol=0, atol=0)

    # bursty: steps alternate cost 1, 19 — lag-1 distance averages to 10,
    # lag-2 is exactly 20 (one full pair); a mean-rate axis would also say
    # 10/20 here, but lag-1 from a *specific* parity start would say 1 or 19
    inc = np.tile([1.0, 19.0], 50)
    e2 = np.cumsum(inc)
    axis2 = _exact_evals_axis(e2, nlags=4)
    assert axis2[0] == 0.0
    np.testing.assert_allclose(axis2[2], 20.0, rtol=1e-12)
    np.testing.assert_allclose(axis2[1], 10.0, atol=0.1)  # parity-averaged


def test_sampler_runs_emit_cumulative_evals():
    """Every XLA sampler's sample path emits the per-step chain-mean
    cumulative counter used by the exact fairness axis."""
    from mjhmc_tpu.models import Gaussian
    from mjhmc_tpu.samplers import ControlHMC, MarkovJumpHMC

    dist = Gaussian(ndims=2, log_conditioning=1.0)
    for cls, kw in (
        (MarkovJumpHMC, dict(beta=0.3)),
        (ControlHMC, dict()),
    ):
        s = cls(dist, epsilon=0.8, num_leapfrog_steps=4, nbatch=16, seed=0, **kw)
        out = s.sample(12)
        ev = np.asarray(out["evals_mean"])
        assert ev.shape == (12,)
        d = np.diff(ev)
        assert np.all(d >= 4.0 - 1e-6) and np.all(d <= 8.0 + 1e-6)
        if cls is ControlHMC:  # constant M per step — exactly 4
            np.testing.assert_allclose(d, 4.0)
