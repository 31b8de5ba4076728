"""Autocorrelation / ESS diagnostics, dwell-weight aware, FFT-based.

TPU-native replacement for the reference's pandas-based
``calculate_autocorrelation`` (SURVEY.md §2.5): the autocorrelation curve is
computed on-device with FFTs, supports the Rao-Blackwell dwell weights of
MJHMC, and is reported both per-lag and against the paper's fairness axis —
cumulative gradient evaluations (SURVEY.md §3.3).

Weighted autocovariance at lag τ (per chain, then averaged):

    γ(τ) = Σ_t w_t w_{t+τ} (x_t − μ)(x_{t+τ} − μ) / Σ_t w_t w_{t+τ}

with μ the dwell-weighted global mean. Both numerator and denominator are
cross-correlations, computed with one batched real FFT.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _xcorr_fft(a: Array, b: Array, nlags: int) -> Array:
    """Σ_t a_t·b_{t+τ} for τ=0..nlags-1 via FFT. a, b: (T, ...) time-leading."""
    t = a.shape[0]
    nfft = 1
    while nfft < 2 * t:
        nfft *= 2
    fa = jnp.fft.rfft(a, n=nfft, axis=0)
    fb = jnp.fft.rfft(b, n=nfft, axis=0)
    corr = jnp.fft.irfft(jnp.conj(fa) * fb, n=nfft, axis=0)
    return corr[:nlags]


def weighted_autocorrelation(
    x: Array, w: Array | None = None, nlags: int | None = None
) -> Array:
    """Dwell-weighted autocorrelation curve.

    Args:
      x: samples, (T, ndims, nbatch) — time-leading (as emitted by the
         sampler scans).
      w: Rao-Blackwell dwell weights (T, nbatch), or None for uniform.
      nlags: number of lags (default T//2).

    Returns:
      (nlags,) autocorrelation averaged over dims and chains, ρ(0)=1.
    """
    t, ndims, nbatch = x.shape
    if nlags is None:
        nlags = t // 2
    if w is None:
        w = jnp.ones((t, nbatch), x.dtype)
    wx = w[:, None, :]  # broadcast over dims

    mu = jnp.sum(wx * x, axis=(0, 2), keepdims=True) / jnp.sum(wx, axis=(0, 2), keepdims=True)
    xc = (x - mu) * wx

    num = _xcorr_fft(xc, xc, nlags)  # Σ_t w_t w_{t+τ} dx_t dx_{t+τ}
    wb = jnp.broadcast_to(w[:, None, :], x.shape)
    den = _xcorr_fft(wb, wb, nlags)  # Σ_t w_t w_{t+τ}

    gamma = jnp.sum(num, axis=(1, 2)) / jnp.maximum(jnp.sum(den, axis=(1, 2)), 1e-30)
    return gamma / gamma[0]


def autocorrelation(x: Array, nlags: int | None = None) -> Array:
    """Unweighted autocorrelation (control HMC / NUTS path)."""
    return weighted_autocorrelation(x, None, nlags)


def effective_sample_size(x: Array, w: Array | None = None) -> Array:
    """ESS via Geyer's initial-positive-sequence estimator on ρ(τ).

    Returns a scalar: total effective samples across all chains.
    """
    t, _, nbatch = x.shape
    rho = weighted_autocorrelation(x, w, nlags=t // 2)
    # Geyer: sum consecutive pairs ρ(2k)+ρ(2k+1) while positive
    npairs = rho.shape[0] // 2
    pair = rho[: 2 * npairs].reshape(npairs, 2).sum(axis=1)
    positive = jnp.cumprod(pair > 0.0).astype(rho.dtype)
    tau = -1.0 + 2.0 * jnp.sum(pair * positive)
    tau = jnp.maximum(tau, 1.0)
    return (t * nbatch) / tau


def autocorrelation_vs_grad_evals(
    x: Array,
    grad_evals_per_step: float,
    w: Array | None = None,
    nlags: int | None = None,
):
    """The paper's fairness curve: ρ as a function of cumulative grad evals.

    Returns (evals, rho): evals[i] = i · grad_evals_per_step. Samplers with
    different per-step costs (HMC: M; MJHMC: M + refresh rebuilds —
    SURVEY.md §4.4 cost model) become directly comparable on this axis.
    """
    rho = weighted_autocorrelation(x, w, nlags)
    lags = jnp.arange(rho.shape[0], dtype=jnp.float32)
    return lags * grad_evals_per_step, rho
