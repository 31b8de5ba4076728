"""Algebraic ladder oracle tests (SURVEY.md §4.1) — exact, zero tolerance
ambiguity beyond Monte-Carlo error."""

import jax
import numpy as np

from mjhmc_tpu.samplers.algebraic import (
    continuous_rate_matrix,
    discrete_transition_matrix,
    ladder_stationary,
    random_ladder_energies,
    simulate_jump_ladder,
)
from mjhmc_tpu.diagnostics.spectral import (
    spectral_gap_continuous,
    spectral_gap_discrete,
    stationary_distribution,
)


def _energies(seed=0, k=8, scale=1.0):
    return random_ladder_energies(jax.random.key(seed), k, scale)


def test_generator_columns_sum_to_zero():
    a = continuous_rate_matrix(_energies(), beta=0.3)
    np.testing.assert_allclose(a.sum(axis=0), 0.0, atol=1e-12)


def test_discrete_matrix_column_stochastic():
    t = discrete_transition_matrix(_energies(), beta=0.3)
    assert (t >= -1e-14).all()
    np.testing.assert_allclose(t.sum(axis=0), 1.0, atol=1e-12)


def test_continuous_stationary_is_boltzmann():
    """THE oracle: the jump-process generator's nullspace must be
    π(k,d) ∝ exp(-E_k)·½ — validates the L/F/R rate construction exactly."""
    for seed in range(3):
        e = _energies(seed)
        a = continuous_rate_matrix(e, beta=0.4)
        pi_exact = ladder_stationary(e)
        np.testing.assert_allclose(a @ pi_exact, 0.0, atol=1e-12)
        pi_eig = stationary_distribution(a, continuous=True)
        np.testing.assert_allclose(pi_eig, pi_exact, atol=1e-10)


def test_discrete_stationary_is_boltzmann():
    for seed in range(3):
        e = _energies(seed)
        t = discrete_transition_matrix(e, beta=0.5)
        pi = ladder_stationary(e)
        np.testing.assert_allclose(t @ pi, pi, atol=1e-12)


def test_simulated_jump_matches_eigensolution():
    """Empirical dwell-weighted occupation of the simulated jump chain
    (same Gumbel-max + Rao-Blackwell machinery as the continuous sampler)
    must match the exact stationary law within MC error."""
    e = _energies(seed=1, k=6)
    pi = ladder_stationary(e)
    sim = simulate_jump_ladder(e, beta=0.5, key=jax.random.key(42),
                              num_steps=4000, nchains=512)
    occ = np.asarray(sim.occupation)
    tv = 0.5 * np.abs(occ - pi).sum()
    assert tv < 0.02, f"TV distance {tv} too large"


def test_continuous_gap_geq_discrete():
    """The paper's headline ladder result (SURVEY.md §6): the jump process
    mixes at least as fast as discrete HMC at matched parameters."""
    wins = 0
    for seed in range(5):
        e = _energies(seed, k=10)
        beta = 0.3
        gap_c = spectral_gap_continuous(continuous_rate_matrix(e, beta))
        # compare against the discrete chain's gap per unit step
        gap_d = spectral_gap_discrete(discrete_transition_matrix(e, beta))
        if gap_c >= gap_d - 1e-9:
            wins += 1
    assert wins >= 4, f"continuous gap ≥ discrete in only {wins}/5 draws"


def test_jump_chain_beats_discrete_hmc_on_rough_ladders():
    """The paper's efficiency claim at matched gradient budget: per
    sampler iteration (= M grad evals for both), the embedded jump chain's
    spectral gap exceeds discrete HMC's on rough energy ladders (barrier
    scale ≳ 1), by a growing factor as the landscape roughens; on smooth
    ladders the two are comparable. Matrix-exact — no Monte-Carlo noise."""
    from mjhmc_tpu.samplers.algebraic import embedded_jump_chain

    def mean_ratio(scale, n_draws=8):
        rj, rd = [], []
        for seed in range(n_draws):
            e = random_ladder_energies(jax.random.key(seed), 12, scale)
            p = embedded_jump_chain(e, 0.3)
            # column-stochastic; note the jump chain's stationary law is the
            # rate-biased π·total/E[total] — the dwell weights correct for
            # it, so π itself is NOT stationary for P (by design)
            np.testing.assert_allclose(p.sum(axis=0), 1.0, atol=1e-12)
            rj.append(spectral_gap_discrete(p))
            rd.append(spectral_gap_discrete(discrete_transition_matrix(e, 0.3)))
        return np.mean(rj) / np.mean(rd)

    assert mean_ratio(2.0) > 2.0  # rough: jump chain decisively faster
    assert mean_ratio(4.0) > 5.0  # rougher: advantage grows
    assert mean_ratio(0.5) > 0.7  # smooth: comparable (no big loss)


def test_reduced_flip_stationary_is_boltzmann():
    """The reduced-flip variant (SURVEY.md §2.4) must be exactly
    π-stationary: validates the discrete max(0,·) flip construction."""
    from mjhmc_tpu.samplers.algebraic import reduced_flip_transition_matrix

    for seed in range(3):
        e = _energies(seed)
        t = reduced_flip_transition_matrix(e, beta=0.4)
        assert (t >= -1e-14).all()
        np.testing.assert_allclose(t.sum(axis=0), 1.0, atol=1e-12)
        pi = ladder_stationary(e)
        np.testing.assert_allclose(t @ pi, pi, atol=1e-12)


def test_reduced_flip_between_discrete_and_jump():
    """Paper ordering at matched per-iteration budget: reduced-flip mixes at
    least as fast as flip-on-reject HMC on average, and the embedded jump
    chain dominates both on rough ladders. Matrix-exact."""
    from mjhmc_tpu.samplers.algebraic import (
        embedded_jump_chain,
        reduced_flip_transition_matrix,
    )

    def gaps(scale, n_draws=8):
        rr, rd, rj = [], [], []
        for seed in range(n_draws):
            e = random_ladder_energies(jax.random.key(seed), 12, scale)
            rr.append(
                spectral_gap_discrete(reduced_flip_transition_matrix(e, 0.3))
            )
            rd.append(spectral_gap_discrete(discrete_transition_matrix(e, 0.3)))
            rj.append(spectral_gap_discrete(embedded_jump_chain(e, 0.3)))
        return np.mean(rr), np.mean(rd), np.mean(rj)

    for scale in (1.0, 2.0, 4.0):
        rf, d, j = gaps(scale)
        assert rf >= d * 0.999, f"reduced-flip < discrete at scale {scale}"
        assert j >= rf * 1.2, f"jump chain should dominate at scale {scale}"


def test_simulated_discrete_ladder_matches_matrix():
    """Empirical occupation of the simulated control-HMC ladder chain must
    match the transition matrix's stationary law within MC error."""
    from mjhmc_tpu.samplers.algebraic import simulate_discrete_ladder

    e = _energies(seed=4, k=6)
    pi = ladder_stationary(e)
    occ = np.asarray(
        simulate_discrete_ladder(e, beta=0.5, key=jax.random.key(7),
                                 num_steps=4000, nchains=512)
    )
    tv = 0.5 * np.abs(occ - pi).sum()
    assert tv < 0.02, f"TV distance {tv}"


def test_plain_hmc_variant_valid():
    """reject→stay is valid only with full refresh (β=1, corruption after MH)."""
    e = _energies(2)
    t = discrete_transition_matrix(e, beta=1.0, flip_on_reject=False)
    pi = ladder_stationary(e)
    np.testing.assert_allclose(t.sum(axis=0), 1.0, atol=1e-12)
    np.testing.assert_allclose(t @ pi, pi, atol=1e-12)
