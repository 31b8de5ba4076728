"""Eight-schools hierarchical posterior: oracle + parameterization tests.

The model ships an *exact* oracle (the school effects integrate out
analytically; a dense 2-D quadrature grid gives float64 moments and exact
posterior draws), so this file can pin three things hard:

1. analytic gradients == autodiff, both parameterizations;
2. the quadrature moments == exact-draw empirical moments (oracle
   self-consistency, no MCMC involved);
3. the classic parameterization story on real data: a warmup-tuned MJHMC
   matches the oracle tightly on the NON-centered form, while the same
   protocol on the CENTERED form visibly underexplores the τ→0 funnel
   neck (Var[log τ] biased low) — the documented pathology this model
   exists to exercise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjhmc_tpu.models import EightSchools
from mjhmc_tpu.ops.pallas_mjhmc import energy_spec_for
from mjhmc_tpu.samplers.adaptation import mjhmc_full_warmup
from mjhmc_tpu.samplers.mjhmc import mjhmc_run

PARAMS = ("centered", "noncentered")


@pytest.mark.parametrize("par", PARAMS)
def test_grad_matches_autodiff(par):
    d = EightSchools(parameterization=par)
    x = d.init_x(jax.random.key(0), 32)
    u, g = d.potential_and_grad(x)
    np.testing.assert_allclose(
        np.asarray(u), np.asarray(d.potential(x)), rtol=1e-6
    )
    g_ref = jax.jacrev(lambda xx: d.potential(xx).sum())(x)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), rtol=3e-4, atol=3e-4
    )


def test_rank_polymorphic():
    d = EightSchools()
    x = d.init_x(jax.random.key(1), 6)
    u = d.potential(jnp.stack([x, 2.0 * x]))
    assert u.shape == (2, 6)
    np.testing.assert_allclose(u[0], d.potential(x), rtol=1e-6)


@pytest.mark.parametrize("par", PARAMS)
def test_exact_draws_match_quadrature(par):
    """Exact posterior draws (grid-categorical + conditional Gaussian)
    reproduce the quadrature moments — validates the oracle end to end
    with no sampler in the loop."""
    d = EightSchools(parameterization=par)
    x = d.exact_sample(0, 200_000)
    qm = np.asarray(d.analytic_mean(), np.float64)
    qv = np.asarray(d.analytic_var(), np.float64)
    assert np.abs(x.mean(axis=1) - qm).max() < 0.1
    assert np.abs(x.var(axis=1) / qv - 1.0).max() < 0.04


def test_shrinkage_ordering():
    """Every posterior school mean sits strictly between its raw estimate
    yⱼ and the population mean (partial pooling)."""
    d = EightSchools()
    qm = np.asarray(d.analytic_mean(), np.float64)
    mu, th = qm[0], qm[2:]
    y = np.asarray(d.y, np.float64)
    assert (np.abs(th - mu) <= np.abs(y - mu) + 1e-9).all()
    # and the extreme school (y=28) is shrunk a lot on this data
    assert abs(th[0] - mu) < 0.2 * abs(y[0] - mu)


@pytest.mark.parametrize("par", PARAMS)
def test_energy_spec_codegen(par):
    """Fused-engine spec (2d-row param plumbing) == distribution energy."""
    d = EightSchools(parameterization=par)
    spec = energy_spec_for(d)
    x3 = d.init_x(jax.random.key(2), 64).reshape(d.ndims, 8, 8)
    pv = spec.param_vector(d.ndims)
    assert pv.shape == (2 * d.ndims,)
    params = jnp.broadcast_to(
        jnp.asarray(pv)[:, None, None], (pv.shape[0], 8, 8)
    )
    u3 = spec.u_sum(x3, params).reshape(64)
    g3 = spec.du(x3, params).reshape(d.ndims, 64)
    u_ref, g_ref = d.potential_and_grad(x3.reshape(d.ndims, 64))
    np.testing.assert_allclose(
        np.asarray(u3), np.asarray(u_ref), rtol=2e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(g3), np.asarray(g_ref), rtol=2e-4, atol=2e-4
    )


def _warmed_moments(par, steps, seed):
    d = EightSchools(parameterization=par)
    state, eps, inv_mass = mjhmc_full_warmup(
        d, jax.random.key(seed), nbatch=256, num_leapfrog_steps=8
    )
    state, out = jax.jit(
        lambda s, k: mjhmc_run(
            d, s, k, steps, eps, 0.15, 8, collect="samples",
            inv_mass=inv_mass,
        )
    )(state, jax.random.key(seed + 1))
    xs = np.asarray(out["x"])
    w = np.asarray(out["dwell"])[:, None, :]
    mean = (w * xs).sum(axis=(0, 2)) / w.sum()
    var = (w * (xs - mean[None, :, None]) ** 2).sum(axis=(0, 2)) / w.sum()
    qm = np.asarray(d.analytic_mean(), np.float64)
    qv = np.asarray(d.analytic_var(), np.float64)
    return mean - qm, var / qv


def test_noncentered_matches_oracle():
    mean_err, var_ratio = _warmed_moments("noncentered", 1500, 3)
    assert np.abs(mean_err).max() < 0.4, mean_err
    assert np.abs(var_ratio - 1.0).max() < 0.15, var_ratio


def test_centered_funnel_pathology():
    """Same warmup+sampler protocol on the centered form underexplores the
    τ→0 neck. The stable signature (seed-robust, unlike Var[log τ] alone):
    missing the neck drops exactly the states where the θⱼ are tightly
    shrunk onto μ, so every school variance comes out systematically HIGH —
    while the non-centered run (previous test) sits within 15% across the
    board. This is the documented diagnostic the model exists to provide."""
    mean_err, var_ratio = _warmed_moments("centered", 1200, 5)
    assert np.median(var_ratio[2:]) > 1.12, var_ratio
    assert var_ratio[1] < 0.95, var_ratio  # and the ℓ spread reads low
