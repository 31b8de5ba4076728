"""Markov Jump HMC core tests: cache state machine, counters, moments.

The cache-correctness test is the critical one (SURVEY.md §7 hard part #1):
each step the fused backward pass recomputes H(L⁻¹ζ) fresh for every chain,
and the step reports |cached − fresh| wherever the cache claims validity.
A correct cache state machine ⇒ discrepancy ≈ float roundoff only.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.models import Gaussian, RoughWell
from mjhmc_tpu.samplers import MarkovJumpHMC, make_mj_state, mjhmc_run


def test_cache_state_machine_exact():
    dist = Gaussian(ndims=4, log_conditioning=1.5)
    s = MarkovJumpHMC(
        dist, epsilon=0.5, beta=0.3, num_leapfrog_steps=5, nbatch=256, seed=0
    )
    out = s.sample(200)
    cerr = np.asarray(out["cache_err"])
    # fp32 leapfrog roundtrip error on O(1) energies
    assert cerr.max() < 5e-3, f"cache mismatch: max {cerr.max()}"


def test_cache_state_machine_rough_well():
    dist = RoughWell(ndims=2)
    s = MarkovJumpHMC(
        dist, epsilon=1.0, beta=0.2, num_leapfrog_steps=10, nbatch=256, seed=1
    )
    out = s.sample(200)
    assert np.asarray(out["cache_err"]).max() < 5e-3


def test_eval_counter_cost_model():
    """Algorithmic evals = M per step + M per post-refresh rebuild
    (+M for the cold start), exactly (SURVEY.md §4.4)."""
    dist = Gaussian(ndims=2, log_conditioning=1.0)
    m, steps, n = 5, 100, 64
    s = MarkovJumpHMC(dist, epsilon=0.5, beta=0.3, num_leapfrog_steps=m, nbatch=n)
    out = s.sample(steps)
    sel = np.asarray(out["sel"])  # (steps, n)
    # chain pays M extra at step t iff cache invalid at entry: t=0 (cold) or
    # refresh fired at t-1
    rebuilds = 1 + (sel[:-1] == 2).sum(axis=0)  # per chain
    expected = steps * m + m * rebuilds
    got = np.asarray(s.state.grad_evals)
    np.testing.assert_array_equal(got, expected)


def test_all_three_transitions_fire():
    dist = Gaussian(ndims=2, log_conditioning=1.0)
    s = MarkovJumpHMC(dist, epsilon=0.7, beta=0.5, num_leapfrog_steps=3, nbatch=256)
    out = s.sample(300)
    sel = np.asarray(out["sel"])
    counts = np.bincount(sel.ravel(), minlength=3)
    assert (counts > 0).all(), f"some operator never fired: {counts}"


def test_gaussian_moments_dwell_weighted():
    dist = Gaussian(ndims=4, log_conditioning=1.5)
    s = MarkovJumpHMC(
        dist, epsilon=0.5, beta=0.2, num_leapfrog_steps=5, nbatch=512, seed=2
    )
    s.burn_in(300)
    out = s.sample(2000)
    xs = np.asarray(out["x"])  # (T, d, n)
    w = np.asarray(out["dwell"])[:, None, :]  # (T, 1, n)
    wsum = w.sum()
    mean = (w * xs).sum(axis=(0, 2)) / wsum
    var = (w * xs**2).sum(axis=(0, 2)) / wsum - mean**2
    tgt = np.asarray(dist.analytic_var())
    np.testing.assert_allclose(mean, 0.0, atol=3.5 * np.sqrt(tgt.max() / 800))
    np.testing.assert_allclose(var, tgt, rtol=0.15)


def test_rough_well_variance_vs_quadrature():
    dist = RoughWell(ndims=2)
    s = MarkovJumpHMC(
        dist, epsilon=4.0, beta=0.05, num_leapfrog_steps=10, nbatch=1024, seed=3
    )
    s.burn_in(500)
    out = s.sample(3000)
    xs = np.asarray(out["x"])
    w = np.asarray(out["dwell"])[:, None, :]
    var = (w * xs**2).sum(axis=(0, 2)) / w.sum()
    tgt = float(dist.analytic_var()[0])
    np.testing.assert_allclose(var, tgt, rtol=0.2)


def test_dwell_weights_positive_finite():
    dist = RoughWell(ndims=2)
    s = MarkovJumpHMC(dist, epsilon=2.0, beta=0.1, num_leapfrog_steps=5, nbatch=128)
    out = s.sample(100)
    w = np.asarray(out["dwell"])
    assert np.isfinite(w).all() and (w > 0).all()


def test_stats_collect_matches_samples():
    dist = Gaussian(ndims=3, log_conditioning=1.0)
    st0 = make_mj_state(dist, jax.random.key(5), 64)
    k = jax.random.key(6)
    _, out_a = mjhmc_run(dist, st0, k, 50, 0.5, 0.2, 5)
    _, out_b = mjhmc_run(dist, st0, k, 50, 0.5, 0.2, 5, collect="stats")
    acc = out_b["moments"]
    xs = np.asarray(out_a["x"])
    w = np.asarray(out_a["dwell"])[:, None, :]
    mean = (w * xs).sum(axis=(0, 2)) / w.sum()
    np.testing.assert_allclose(np.asarray(acc.mean()), mean, rtol=1e-4, atol=1e-5)


def test_partial_refresh_preserves_target():
    """refresh_fraction < 1 (partial corruption) keeps π invariant."""
    dist = Gaussian(ndims=3, log_conditioning=1.0)
    st0 = make_mj_state(dist, jax.random.key(11), 512)
    _, out = mjhmc_run(
        dist, st0, jax.random.key(12), 2000, 0.5, 0.3, 5,
        refresh_fraction=0.5,
    )
    xs = np.asarray(out["x"])[500:]
    w = np.asarray(out["dwell"])[500:][:, None, :]
    var = (w * xs**2).sum(axis=(0, 2)) / w.sum()
    np.testing.assert_allclose(var, np.asarray(dist.analytic_var()), rtol=0.15)


def test_jump_rates_match_spec_single_step():
    """One hand-checked step: rates computed by the step function equal the
    closed-form Γ_L, Γ_F on a quadratic energy (SURVEY.md §3.1 spec)."""
    from mjhmc_tpu.samplers.mjhmc import mjhmc_step
    from mjhmc_tpu.ops import leapfrog as lf, total_energy

    dist = Gaussian(ndims=2, log_conditioning=0.0)
    st0 = make_mj_state(dist, jax.random.key(7), 8)
    key = jax.random.key(8)
    eps, m = 0.3, 4
    new_state, out = mjhmc_step(dist, st0, key, eps, 0.25, m)

    # independent recomputation of the dwell time
    ch = st0.chain
    h0 = total_energy(ch.u, ch.v)
    xf, vf, uf, _ = lf(dist.potential_and_grad, ch.x, ch.v, ch.grad, eps, m)
    hl = total_energy(uf, vf)
    xb, vb, ub, _ = lf(dist.potential_and_grad, ch.x, -ch.v, ch.grad, eps, m)
    hb = total_energy(ub, vb)
    gl = np.exp(-0.5 * (np.asarray(hl) - np.asarray(h0)))
    gf = np.maximum(0.0, np.exp(-0.5 * (np.asarray(hb) - np.asarray(h0))) - gl)
    t_expected = 1.0 / (gl + gf + 0.25)
    np.testing.assert_allclose(np.asarray(out.dwell), t_expected, rtol=1e-5)
