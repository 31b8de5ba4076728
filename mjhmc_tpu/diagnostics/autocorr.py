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


def _nfft(t: int) -> int:
    nfft = 1
    while nfft < 2 * t:
        nfft *= 2
    return nfft


def _autocorr_fft(a: Array, nlags: int) -> Array:
    """Σ_t a_t·a_{t+τ} for τ=0..nlags-1 via one FFT. a: (T, ...) time-leading.

    a ≡ b in every use here, so conj(F a)·(F a) = |F a|² — one rfft and a
    real power spectrum instead of two transforms and a complex product.
    """
    nfft = _nfft(a.shape[0])
    fa = jnp.fft.rfft(a, n=nfft, axis=0)
    corr = jnp.fft.irfft(jnp.abs(fa) ** 2, n=nfft, axis=0)
    return corr[:nlags]


def weighted_autocorrelation(
    x: Array,
    w: Array | None = None,
    nlags: int | None = None,
    max_fft_bytes: int = 256 * 2**20,
) -> Array:
    """Dwell-weighted autocorrelation curve.

    Args:
      x: samples, (T, ndims, nbatch) — time-leading (as emitted by the
         sampler scans).
      w: Rao-Blackwell dwell weights (T, nbatch), or None for uniform.
      nlags: number of lags (default T//2).
      max_fft_bytes: cap on the complex FFT workspace; larger batches are
        processed in chain chunks (the lag sums pool over chains, so
        chunk-and-accumulate is exact). Keeps long streamed runs (e.g.
        2000×36×4096 product-of-t) from exhausting HBM.

    Returns:
      (nlags,) autocorrelation averaged over dims and chains, ρ(0)=1.
    """
    t, ndims, nbatch = x.shape
    if nlags is None:
        nlags = t // 2
    if w is None:
        w = jnp.ones((t, nbatch), x.dtype)

    # per-dim weighted mean (the weight sum is dim-independent)
    mu = jnp.sum(w[:, None, :] * x, axis=(0, 2), keepdims=True) / jnp.maximum(
        jnp.sum(w), 1e-30
    )

    chunk = max(1, min(nbatch, int(max_fft_bytes // (_nfft(t) * ndims * 8))))
    num = jnp.zeros((nlags,), jnp.float32)
    den = jnp.zeros((nlags,), jnp.float32)
    for i0 in range(0, nbatch, chunk):  # static unroll; 1 iter when small
        xs = x[:, :, i0 : i0 + chunk]
        ws = w[:, i0 : i0 + chunk]
        xc = (xs - mu) * ws[:, None, :]
        # Σ_t w_t w_{t+τ} dx_t dx_{t+τ}, pooled over dims and chains
        num = num + jnp.sum(_autocorr_fft(xc, nlags), axis=(1, 2))
        # Σ_t w_t w_{t+τ}: identical for every dim — compute per chain only
        den = den + jnp.sum(_autocorr_fft(ws, nlags), axis=1)

    gamma = num / jnp.maximum(ndims * den, 1e-30)
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
