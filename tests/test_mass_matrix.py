"""Diagonal mass-matrix (preconditioning) tests.

With M = target covariance, an ill-conditioned Gaussian becomes isotropic
in the preconditioned dynamics — correctness (stationarity preserved) and
effectiveness (acceptance/mixing at large ε) are both checked.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.models import Gaussian
from mjhmc_tpu.samplers import ControlHMC, MarkovJumpHMC
from mjhmc_tpu.samplers.adaptation import mjhmc_full_warmup
from mjhmc_tpu.diagnostics import effective_sample_size


def _dist():
    return Gaussian(ndims=10, log_conditioning=3.0)  # condition number 1000


def test_hmc_with_exact_mass_preserves_target():
    dist = _dist()
    mass = tuple(1.0 / float(v) for v in dist.variances)  # M = Σ⁻¹
    s = ControlHMC(
        dist, epsilon=1.0, beta=1.0, num_leapfrog_steps=10, nbatch=512,
        mass_diag=mass, seed=0,
    )
    s.burn_in(200)
    out = s.sample(1200)
    xs = np.asarray(out["x"])
    var = xs.var(axis=(0, 2))
    np.testing.assert_allclose(var, np.asarray(dist.analytic_var()), rtol=0.2)
    # preconditioned dynamics accept healthily at ε=1.0 despite the
    # condition number of 1e3 (mixing advantage is covered by the ESS test)
    assert np.asarray(out["accept"]).mean() > 0.6


def test_mjhmc_with_exact_mass_preserves_target():
    dist = _dist()
    mass = tuple(1.0 / float(v) for v in dist.variances)
    s = MarkovJumpHMC(
        dist, epsilon=1.0, beta=0.2, num_leapfrog_steps=5, nbatch=512,
        mass_diag=mass, seed=1,
    )
    s.burn_in(300)
    out = s.sample(1500)
    xs = np.asarray(out["x"])
    w = np.asarray(out["dwell"])[:, None, :]
    var = (w * xs**2).sum(axis=(0, 2)) / w.sum()
    np.testing.assert_allclose(var, np.asarray(dist.analytic_var()), rtol=0.2)
    assert np.asarray(out["cache_err"]).max() < 5e-3  # cache machine intact


def test_mass_dramatically_improves_mixing():
    """Same ε/M budget: preconditioned MJHMC must beat unit-mass MJHMC on
    ESS for the stiff dimension by a wide margin."""
    dist = _dist()
    mass = tuple(1.0 / float(v) for v in dist.variances)
    kw = dict(epsilon=0.8, beta=0.2, num_leapfrog_steps=5, nbatch=256)

    ess = {}
    for name, md in (("unit", None), ("precond", mass)):
        s = MarkovJumpHMC(dist, mass_diag=md, seed=2, **kw)
        s.burn_in(300)
        out = s.sample(800)
        # slowest dimension = largest variance (last)
        xs = jnp.asarray(out["x"])[:, -1:, :]
        ess[name] = float(
            effective_sample_size(xs, jnp.asarray(out["dwell"]))
        )
    assert ess["precond"] > 3.0 * ess["unit"], ess


def test_nuts_with_mass_preserves_target_and_shrinks_trees():
    from mjhmc_tpu.samplers import NUTS

    dist = _dist()
    mass = tuple(1.0 / float(v) for v in dist.variances)
    s = NUTS(dist, epsilon=0.7, max_depth=8, nbatch=256, mass_diag=mass, seed=4)
    s.burn_in(100)
    out = s.sample(400)
    xs = np.asarray(out["x"])
    var = xs.var(axis=(0, 2))
    np.testing.assert_allclose(var, np.asarray(dist.analytic_var()), rtol=0.25)
    # preconditioned trees are shallow; unit-mass trees must go much deeper
    d_pre = float(np.asarray(out["depth"]).mean())
    s_unit = NUTS(dist, epsilon=0.7, max_depth=8, nbatch=128, seed=4)
    d_unit = float(np.asarray(s_unit.sample(50)["depth"]).mean())
    assert d_unit > d_pre + 1.5, (d_unit, d_pre)


def test_full_warmup_learns_mass_and_eps():
    dist = _dist()
    state, eps, inv_mass = jax.jit(
        lambda k: mjhmc_full_warmup(
            dist, k, nbatch=512, beta=0.2, num_leapfrog_steps=5, eps0=0.05,
            phase1=200, phase2=400, phase3=200,
        ),
        static_argnums=(),
    )(jax.random.key(3))
    # learned inverse mass ≈ target variances (within MC error)
    tgt = np.asarray(dist.analytic_var())
    ratio = np.asarray(inv_mass).ravel() / tgt
    assert (ratio > 0.4).all() and (ratio < 2.5).all(), ratio
    assert 0.05 < float(eps) < 10.0
