"""MALT stationarity + cost-model tests (arXiv:2210.12200; SURVEY.md §2.9 [P2])."""

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.models import Gaussian, RoughWell
from mjhmc_tpu.samplers import MALT, make_hmc_state
from mjhmc_tpu.samplers.malt import malt_run


def test_gaussian_moments():
    dist = Gaussian(ndims=4, log_conditioning=1.5)
    s = MALT(dist, epsilon=0.5, gamma=1.0, num_leapfrog_steps=5, nbatch=512, seed=0)
    s.burn_in(300)
    out = s.sample(1500)
    xs = np.asarray(out["x"])  # (T, d, n)
    mean = xs.mean(axis=(0, 2))
    var = xs.var(axis=(0, 2))
    tgt_var = np.asarray(dist.analytic_var())
    np.testing.assert_allclose(mean, 0.0, atol=3.5 * np.sqrt(tgt_var.max() / 500))
    np.testing.assert_allclose(var, tgt_var, rtol=0.15)


def test_eval_counters():
    """Exactly L gradient evals per iteration per chain (cached entry grad)."""
    dist = Gaussian(ndims=2)
    s = MALT(dist, num_leapfrog_steps=7, nbatch=32)
    s.sample(13)
    assert s.grad_evals == 13 * 7 * 32


def test_small_eps_always_accepts():
    """Δ is the sum of BAB leapfrog errors = O(ε²) → tiny ε accepts."""
    dist = Gaussian(ndims=2, log_conditioning=0.0)
    s = MALT(dist, epsilon=0.01, gamma=2.0, num_leapfrog_steps=3, nbatch=64)
    out = s.sample(50)
    assert np.asarray(out["accept"]).mean() > 0.999


def test_zero_friction_matches_hmc_acceptance():
    """γ=0 makes the O steps identity: MALT ≡ HMC with full refresh, so the
    mean acceptance statistic must agree with ControlHMC(β=1) closely."""
    from mjhmc_tpu.samplers import ControlHMC

    dist = Gaussian(ndims=6, log_conditioning=1.0)
    kw = dict(epsilon=0.4, num_leapfrog_steps=5, nbatch=1024, seed=2)
    a = MALT(dist, gamma=0.0, **kw)
    b = ControlHMC(dist, beta=1.0, **kw)
    acc_a = np.asarray(a.sample(200)["accept_stat"]).mean()
    acc_b = np.asarray(b.sample(200)["accept_stat"]).mean()
    assert abs(acc_a - acc_b) < 0.02, (acc_a, acc_b)


def test_friction_damps_momentum_correlation():
    """Higher γ must decorrelate successive iterations' displacements less
    ballistically: average squared per-iteration displacement shrinks."""
    dist = Gaussian(ndims=2, log_conditioning=0.0)
    kw = dict(epsilon=0.2, num_leapfrog_steps=10, nbatch=512, seed=0)
    disp = {}
    for gamma in (0.0, 8.0):
        s = MALT(dist, gamma=gamma, **kw)
        s.burn_in(100)
        xs = np.asarray(s.sample(300)["x"])
        d = np.diff(xs, axis=0)
        disp[gamma] = float((d**2).sum(axis=1).mean())
    assert disp[8.0] < disp[0.0]


def test_rough_well_variance():
    """Dominant quadratic scale of the 2-D rough well is recovered."""
    dist = RoughWell(ndims=2)
    s = MALT(dist, epsilon=4.0, gamma=0.1, num_leapfrog_steps=10, nbatch=512, seed=1)
    s.burn_in(500)
    xs = np.asarray(s.sample(2000)["x"])
    var = xs.var(axis=(0, 2))
    # scale1 = 100 → variance ≈ 1e4 (ripples perturb it by a few percent)
    np.testing.assert_allclose(var, 1e4, rtol=0.25)


def test_stats_collect_matches_samples():
    dist = Gaussian(ndims=3, log_conditioning=1.0)
    st0 = make_hmc_state(dist, jax.random.key(3), 64)
    krun = jax.random.key(4)
    _, out_a = malt_run(dist, st0, krun, 40, 0.4, 1.0, 5)
    _, out_b = malt_run(dist, st0, krun, 40, 0.4, 1.0, 5, collect="stats")
    acc = out_b["moments"]
    xs = np.asarray(out_a["x"])
    np.testing.assert_allclose(
        np.asarray(acc.mean()), xs.mean(axis=(0, 2)), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(acc.var()), xs.var(axis=(0, 2)), rtol=1e-3, atol=1e-5
    )


def test_mass_matrix_preconditioning():
    """Diagonal mass matrix: ill-conditioned Gaussian sampled accurately
    with a step size that would be unstable unpreconditioned."""
    dist = Gaussian(ndims=4, log_conditioning=2.0)
    var = np.asarray(dist.analytic_var())
    s = MALT(
        dist,
        epsilon=0.9,
        gamma=1.0,
        num_leapfrog_steps=5,
        nbatch=512,
        seed=0,
        mass_diag=tuple(1.0 / var),
    )
    s.burn_in(300)
    out = s.sample(1200)
    xs = np.asarray(out["x"])
    np.testing.assert_allclose(xs.var(axis=(0, 2)), var, rtol=0.15)
    assert np.asarray(out["accept"]).mean() > 0.8


def test_dual_averaging_adapts_malt_step():
    """Warmup drives the acceptance statistic to the target."""
    from mjhmc_tpu.samplers.adaptation import (
        adaptive_malt_run,
        da_epsilon,
        da_init,
    )

    dist = Gaussian(ndims=4, log_conditioning=1.0)
    st0 = make_hmc_state(dist, jax.random.key(0), 256)
    st, da, aux = adaptive_malt_run(
        dist, st0, da_init(1e-3), jax.random.key(1), 400, 1.0, 5,
        target_accept=0.8,
    )
    eps = float(da_epsilon(da, frozen=True))
    assert 0.05 < eps < 2.0, eps
    # frozen step size should land near the target acceptance
    s = MALT(dist, epsilon=eps, gamma=1.0, num_leapfrog_steps=5, nbatch=512)
    s.burn_in(100)
    acc = float(np.asarray(s.sample(200)["accept_stat"]).mean())
    assert abs(acc - 0.8) < 0.12, (eps, acc)
