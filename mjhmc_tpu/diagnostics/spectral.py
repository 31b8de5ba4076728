"""Spectral-gap diagnostics (SURVEY.md §2.4 / §3.4).

Small dense eigendecompositions of ladder transition/rate matrices. These
are O(K³) on 2K×2K matrices (K ~ tens) — host-side NumPy ``eig`` is the
right tool (non-symmetric eig is not a TPU op); everything upstream of the
matrices runs on-device.
"""

from __future__ import annotations

import numpy as np


def stationary_distribution(mat: np.ndarray, continuous: bool) -> np.ndarray:
    """Stationary law of a column-stochastic matrix (discrete) or
    column-generator (continuous): eigvector at λ=1 / λ=0."""
    w, v = np.linalg.eig(mat)
    target = 0.0 if continuous else 1.0
    i = int(np.argmin(np.abs(w - target)))
    pi = np.real(v[:, i])
    pi = np.abs(pi)
    return pi / pi.sum()


def spectral_gap_discrete(t: np.ndarray) -> float:
    """1 − |λ₂| of a column-stochastic transition matrix."""
    w = np.linalg.eigvals(t)
    mod = np.sort(np.abs(w))[::-1]
    return float(1.0 - mod[1])


def spectral_gap_continuous(a: np.ndarray) -> float:
    """Second-smallest |Re λ| of a generator (smallest is 0)."""
    w = np.linalg.eigvals(a)
    re = np.sort(np.abs(np.real(w)))
    return float(re[1])


def empirical_spectral_gap(x, w=None, nlags: int | None = None) -> float:
    """On-device estimate of 1 − λ₂ from sampled chains (BASELINE config 4:
    spectral diagnostics without an explicit transition matrix).

    For a reversible chain, the lag-autocorrelation of any observable decays
    as λ₂^τ; fitting log ρ(τ) over the initial positive lags of the slowest
    dim gives λ₂, hence the gap. ``x``: (T, ndims, nbatch); ``w`` optional
    dwell weights (T, nbatch).
    """
    import jax.numpy as jnp

    from mjhmc_tpu.diagnostics.autocorr import weighted_autocorrelation

    t = x.shape[0]
    if nlags is None:
        nlags = min(50, t // 4)
    # slowest dim: compute per-dim autocorr and take the max-|rho(1)| dim
    rhos = []
    for d in range(x.shape[1]):
        rho = weighted_autocorrelation(x[:, d : d + 1, :], w, nlags)
        rhos.append(np.asarray(rho))
    rho = rhos[int(np.argmax([abs(r[1]) for r in rhos]))]
    pos = rho > 0.05
    k = int(np.argmin(pos)) if not pos.all() else len(rho)
    k = max(k, 3)
    taus = np.arange(1, k)
    lam2 = np.exp(np.polyfit(taus, np.log(np.maximum(rho[1:k], 1e-8)), 1)[0])
    return float(1.0 - lam2)
