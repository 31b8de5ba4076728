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
