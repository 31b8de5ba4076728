"""Split-R̂ convergence diagnostic (Gelman–Rubin potential scale reduction).

Beyond-reference production diagnostic (the reference validated
convergence by eye against analytic moments — SURVEY.md §4): split-chain
R̂ per dimension, with a dwell-weighted variant so MJHMC's
Rao-Blackwellized streams are diagnosed on the correctly weighted
posterior rather than the raw jump-chain occupation.

All reductions are plain jnp sums over the time and chain axes, so under
a chain-sharded run this compiles to one psum per moment — a diagnostics
path, never the sampler hot loop (tests/test_collectives.py invariant).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def potential_scale_reduction(x: Array, w: Array | None = None) -> Array:
    """Split-R̂ per dimension.

    Args:
      x: samples, (T, ndims, nbatch) — time-leading, chain axis last
         (the layout every sampler scan emits).
      w: optional Rao-Blackwell dwell weights (T, nbatch).

    Returns:
      (ndims,) split-R̂; ≈1 at convergence, ≫1 when chains disagree.

    Each chain is split in half (2·nbatch half-chains), guarding against
    trending chains that would otherwise average out. With weights, chain
    means/variances are dwell-weighted and each half-chain's effective
    length is its normalized weight mass (Kish effective sample size
    ratio), which reduces to T/2 for uniform weights.
    """
    t, ndims, nbatch = x.shape
    th = t // 2
    if th < 2:
        raise ValueError("need at least 4 samples per chain for split-R̂")
    # (th, ndims, 2*nbatch): halves stacked on the chain axis — stacking on
    # a trailing new axis keeps the (possibly sharded) chain axis intact
    xs = jnp.concatenate([x[:th], x[th : 2 * th]], axis=-1)
    if w is None:
        ws = jnp.ones((th, 2 * nbatch), x.dtype)
    else:
        ws = jnp.concatenate([w[:th], w[th : 2 * th]], axis=-1)
    wb = ws[:, None, :]

    wsum = jnp.sum(wb, axis=0)  # (1, 2n) — per half-chain weight mass
    mean_j = jnp.sum(wb * xs, axis=0) / wsum  # (ndims, 2n)
    var_j = jnp.sum(wb * (xs - mean_j[None]) ** 2, axis=0) / wsum

    # within-chain variance, weighted by chain mass
    w_chain = wsum[0]  # (2n,)
    w_tot = jnp.sum(w_chain)
    w_var = jnp.sum(var_j * w_chain[None, :], axis=1) / w_tot  # (ndims,)

    # between-chain variance of the half-chain means
    grand = jnp.sum(mean_j * w_chain[None, :], axis=1) / w_tot
    b_var = jnp.sum(w_chain[None, :] * (mean_j - grand[:, None]) ** 2, axis=1) / w_tot

    # effective per-chain length: chain-averaged Kish ESS of the dwell
    # weights, (Σ_t w)²/Σ_t w² — equals th for uniform weights
    n_eff = jnp.mean(jnp.sum(ws, axis=0)) ** 2 / jnp.mean(jnp.sum(ws**2, axis=0))

    var_plus = (n_eff - 1.0) / n_eff * w_var + b_var
    return jnp.sqrt(var_plus / jnp.maximum(w_var, 1e-30))
