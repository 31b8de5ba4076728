"""Algebraic ladder samplers — the exact finite-state oracle.

Finite-state abstraction of HMC (SURVEY.md §2.4, arXiv:1509.03808): states
are (rung k, direction d) on a ladder of K rungs with given energies E_k;
the L operator moves one rung in direction d, F flips d, R randomizes d.
We build the **explicit 2K×2K transition / rate matrices**, eigensolve for
stationary distributions and spectral gaps, and simulate the jump chain
with exactly the same Gumbel-max + dwell-weight machinery as the
continuous-state sampler — so the MJHMC rate logic is tested against an
exact eigensolution with zero tolerance ambiguity (SURVEY.md §4.1).

The ladder here is **periodic** (k+d mod K): L is then a bijection with
L⁻¹ = F∘L∘F and H(Fζ)=H(ζ), which is exactly the setting of the generic
stationarity derivation (SURVEY.md §3.1 [D]), so π(k,d) ∝ exp(-E_k)·½ is
the unique stationary law and the oracle is assumption-free.

State indexing: s ∈ [0, 2K): k = s mod K; d = +1 for s < K else −1.
Matrices are column-convention: M[i, j] = flow j → i; M @ π evolves a
distribution π.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _split_state(s: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    rung = s % k
    d = np.where(s < k, 1, -1)
    return rung, d


def ladder_stationary(energies: np.ndarray) -> np.ndarray:
    """Exact stationary distribution π(k,d) ∝ exp(-E_k)·½, shape (2K,)."""
    e = np.asarray(energies, np.float64)
    p = np.exp(-(e - e.min()))
    p = p / p.sum() / 2.0
    return np.concatenate([p, p])


def continuous_rate_matrix(energies: np.ndarray, beta: float) -> np.ndarray:
    """Generator A of the MJHMC jump process on the ladder, (2K, 2K).

    From (k,d): L-clock rate exp(-½(E_{k+d}−E_k)) → (k+d, d);
    F-clock rate max(0, Γ_L(k,−d) − Γ_L(k,d)) → (k,−d);
    R-clock rate β, new direction uniform → rate β/2 to (k,−d)
    (the β/2 self-transition is a no-op in a generator).
    """
    e = np.asarray(energies, np.float64)
    k = e.shape[0]
    n = 2 * k
    a = np.zeros((n, n))
    s = np.arange(n)
    rung, d = _split_state(s, k)

    def idx(rung, d):
        return np.where(d > 0, rung % k, k + (rung % k))

    gamma_l = np.exp(-0.5 * (e[(rung + d) % k] - e[rung]))
    gamma_lf = np.exp(-0.5 * (e[(rung - d) % k] - e[rung]))
    gamma_f = np.maximum(0.0, gamma_lf - gamma_l)

    a[idx(rung + d, d), s] += gamma_l
    a[idx(rung, -d), s] += gamma_f + beta / 2.0
    a[s, s] -= a.sum(axis=0)
    return a


def discrete_transition_matrix(
    energies: np.ndarray, beta: float, flip_on_reject: bool = True
) -> np.ndarray:
    """Column-stochastic transition matrix of control HMC on the ladder.

    One iteration = momentum corruption (flip d with prob β/2) followed by
    the MH move: accept (k+d, d) with min(1, exp(E_k − E_{k+d})), else flip
    to (k,−d). Mirrors ``samplers.hmc.hmc_step`` semantics exactly (§3.2).

    ``flip_on_reject=False`` is the plain-HMC variant: reject → stay. That
    is only π-invariant under full momentum refresh, so it requires β=1
    (direction fully randomized) and applies the corruption *after* the MH
    move so the returned matrix is exactly π-stationary.
    """
    e = np.asarray(energies, np.float64)
    k = e.shape[0]
    n = 2 * k
    s = np.arange(n)
    rung, d = _split_state(s, k)

    def idx(rung, d):
        return np.where(d > 0, rung % k, k + (rung % k))

    # corruption kernel C: flip direction with prob q
    q = beta / 2.0
    c = np.zeros((n, n))
    c[s, s] += 1.0 - q
    c[idx(rung, -d), s] += q

    # MH kernel M
    acc = np.minimum(1.0, np.exp(e[rung] - e[(rung + d) % k]))
    m = np.zeros((n, n))
    m[idx(rung + d, d), s] += acc
    if flip_on_reject:
        m[idx(rung, -d), s] += 1.0 - acc
        return m @ c
    assert abs(beta - 1.0) < 1e-12, "plain HMC (no flip) requires beta=1"
    m[s, s] += 1.0 - acc
    return c @ m


def reduced_flip_transition_matrix(
    energies: np.ndarray, beta: float
) -> np.ndarray:
    """Column-stochastic matrix of **reduced-flip HMC** on the ladder.

    The paper's discrete-time variant between control HMC and the jump
    process (SURVEY.md §2.4 "reduced-flip variant"): instead of flipping on
    *every* rejection, flip only with the excess backward leap probability

        p_leap(k,d)  = min(1, exp(E_k − E_{k+d}))
        p_flip(k,d)  = max(0, p_leap(k,−d) − p_leap(k,d))
        p_stay       = 1 − p_leap − p_flip.

    This is the discrete-time analogue of the F-clock's max(0, ·) rate and
    is π-stationary by the same telescoping balance (in-flow to (k,d):
    π(k−d)·p_leap(k−d,d) + π(k)·p_flip(k,−d) equals the out-flow
    π(k)·[p_leap + p_flip]; note p_leap + p_flip = max(p_leap fwd, bwd) ≤ 1
    so probabilities are valid). Composed with the same β/2 direction
    corruption kernel as ``discrete_transition_matrix``.
    """
    e = np.asarray(energies, np.float64)
    k = e.shape[0]
    n = 2 * k
    s = np.arange(n)
    rung, d = _split_state(s, k)

    def idx(rung, d):
        return np.where(d > 0, rung % k, k + (rung % k))

    q = beta / 2.0
    c = np.zeros((n, n))
    c[s, s] += 1.0 - q
    c[idx(rung, -d), s] += q

    p_leap = np.minimum(1.0, np.exp(e[rung] - e[(rung + d) % k]))
    p_leap_b = np.minimum(1.0, np.exp(e[rung] - e[(rung - d) % k]))
    p_flip = np.maximum(0.0, p_leap_b - p_leap)
    m = np.zeros((n, n))
    m[idx(rung + d, d), s] += p_leap
    m[idx(rung, -d), s] += p_flip
    m[s, s] += 1.0 - p_leap - p_flip
    return m @ c


class LadderSim(NamedTuple):
    """Empirical dwell-weighted occupation from simulating the jump chain."""

    occupation: Array  # (2K,) normalized dwell-weighted occupancy
    mean_dwell: Array  # scalar


def simulate_jump_ladder(
    energies: np.ndarray,
    beta: float,
    key: Array,
    num_steps: int,
    nchains: int = 1024,
) -> LadderSim:
    """Simulate the ladder jump process with the continuous sampler's exact
    selection machinery (Gumbel-max over log-rates + Rao-Blackwell dwell
    weights), vectorized over chains. Used by the oracle tests to pin the
    rate logic against ``continuous_rate_matrix``'s eigensolution.
    """
    e = jnp.asarray(energies, jnp.float32)
    k = e.shape[0]
    beta_arr = jnp.float32(beta)

    def step(carry, skey):
        s, occ, wsum = carry
        rung = s % k
        d = jnp.where(s < k, 1, -1)
        gamma_l = jnp.exp(-0.5 * (e[(rung + d) % k] - e[rung]))
        gamma_lf = jnp.exp(-0.5 * (e[(rung - d) % k] - e[rung]))
        gamma_f = jnp.maximum(0.0, gamma_lf - gamma_l)
        total = gamma_l + gamma_f + beta_arr
        dwell = 1.0 / total

        log_rates = jnp.stack(
            [
                jnp.log(gamma_l),
                jnp.log(gamma_f),
                jnp.full_like(gamma_l, jnp.log(beta_arr)),
            ]
        )
        kg, kr = jax.random.split(skey)
        gum = jax.random.gumbel(kg, log_rates.shape, jnp.float32)
        sel = jnp.argmax(log_rates + gum, axis=0)

        def sidx(rung, d):
            return jnp.where(d > 0, rung % k, k + (rung % k))

        s_l = sidx(rung + d, d)
        s_f = sidx(rung, -d)
        d_new = jnp.where(jax.random.uniform(kr, s.shape) < 0.5, 1, -1)
        s_r = sidx(rung, d_new)
        s_next = jnp.where(sel == 0, s_l, jnp.where(sel == 1, s_f, s_r))

        occ = occ + jnp.sum(
            jax.nn.one_hot(s, 2 * k, dtype=jnp.float32) * dwell[:, None], axis=0
        )
        return (s_next, occ, wsum + jnp.sum(dwell)), None

    key_init, key_scan = jax.random.split(key)
    s0 = jax.random.randint(key_init, (nchains,), 0, 2 * k)
    occ0 = jnp.zeros((2 * k,), jnp.float32)
    keys = jax.random.split(key_scan, num_steps)
    (_, occ, wsum), _ = jax.lax.scan(step, (s0, occ0, jnp.float32(0.0)), keys)
    return LadderSim(occupation=occ / wsum, mean_dwell=wsum / (num_steps * nchains))


def embedded_jump_chain(energies: np.ndarray, beta: float) -> np.ndarray:
    """Discrete-time chain embedded in the jump process — one matrix row
    per *iteration* of the Rao-Blackwellized sampler (each iteration costs
    the same M gradient evals as one discrete-HMC step, so per-step
    spectral gaps of this matrix vs ``discrete_transition_matrix`` compare
    the samplers at matched gradient budget).

    P[i,j] = rate(j→i)/total(j) off-diagonal, with the R-clock's 50%
    same-direction refresh as a (β/2)/total self-loop.
    """
    a = continuous_rate_matrix(energies, beta)
    total = -np.diag(a) + beta / 2.0  # Γ_L + Γ_F + β
    p = a.copy()
    np.fill_diagonal(p, 0.0)
    p = p / total[None, :]
    np.fill_diagonal(p, (beta / 2.0) / total)
    return p


def simulate_discrete_ladder(
    energies: np.ndarray,
    beta: float,
    key: Array,
    num_steps: int,
    nchains: int = 1024,
) -> Array:
    """Simulate control HMC on the ladder (corrupt → MH → flip-on-reject),
    mirroring ``discrete_transition_matrix``; returns empirical occupation.
    """
    e = jnp.asarray(energies, jnp.float32)
    k = e.shape[0]
    q = beta / 2.0

    def step(carry, skey):
        s, occ = carry
        kc, km, ka = jax.random.split(skey, 3)
        rung = s % k
        d = jnp.where(s < k, 1, -1)
        # corruption: flip direction with prob q
        d = jnp.where(jax.random.uniform(kc, s.shape) < q, -d, d)
        acc_p = jnp.minimum(1.0, jnp.exp(e[rung] - e[(rung + d) % k]))
        acc = jax.random.uniform(km, s.shape) < acc_p
        rung_new = jnp.where(acc, (rung + d) % k, rung)
        d_new = jnp.where(acc, d, -d)
        s_next = jnp.where(d_new > 0, rung_new, k + rung_new)
        occ = occ + jnp.sum(jax.nn.one_hot(s_next, 2 * k, dtype=jnp.float32), axis=0)
        return (s_next, occ), None

    ki, ks = jax.random.split(key)
    s0 = jax.random.randint(ki, (nchains,), 0, 2 * k)
    keys = jax.random.split(ks, num_steps)
    (_, occ), _ = jax.lax.scan(step, (s0, jnp.zeros((2 * k,), jnp.float32)), keys)
    return occ / jnp.sum(occ)


def random_ladder_energies(key: Array, k: int, scale: float = 1.0) -> np.ndarray:
    """Randomly drawn rung energies (the reference's ladder setup)."""
    return np.asarray(scale * jax.random.normal(key, (k,)), np.float64)
