"""Bayesian-optimization search tests (SURVEY.md §2.8 — Spearmint analogue)."""

import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.models import Gaussian
from mjhmc_tpu.search.bayes import (
    _gp_posterior,
    _fit_theta,
    bayes_minimize,
    bayes_search,
)


def test_gp_interpolates_noise_free():
    """Posterior mean must pass (nearly) through low-noise observations and
    generalize sensibly between them."""
    xs = jnp.linspace(0.0, 1.0, 9)[:, None]
    ys = jnp.sin(2.0 * jnp.pi * xs[:, 0])
    mask = jnp.ones((9,))
    theta = _fit_theta(xs, ys, mask, d=1)
    mu_tr, _ = _gp_posterior(xs, ys, mask, theta, xs)
    assert float(jnp.max(jnp.abs(mu_tr - ys))) < 0.1
    xq = jnp.linspace(0.05, 0.95, 8)[:, None]
    mu_q, sd_q = _gp_posterior(xs, ys, mask, theta, xq)
    true_q = jnp.sin(2.0 * jnp.pi * xq[:, 0])
    assert float(jnp.max(jnp.abs(mu_q - true_q))) < 0.25
    assert float(jnp.max(sd_q)) < 1.0


def test_gp_mask_padding_is_inert():
    """Padded (masked-out) rows must not change the posterior — the property
    the fixed-shape incremental design relies on."""
    xs = jnp.linspace(0.0, 1.0, 6)[:, None]
    ys = xs[:, 0] ** 2
    theta = jnp.array([jnp.log(0.3), 0.0, jnp.log(0.05)])
    xq = jnp.array([[0.33], [0.77]])
    mu_a, sd_a = _gp_posterior(xs, ys, jnp.ones((6,)), theta, xq)

    xs_pad = jnp.concatenate([xs, jnp.full((3, 1), 0.5)])
    ys_pad = jnp.concatenate([ys, jnp.full((3,), 99.0)])
    mask = jnp.concatenate([jnp.ones((6,)), jnp.zeros((3,))])
    mu_b, sd_b = _gp_posterior(xs_pad, ys_pad, mask, theta, xq)
    np.testing.assert_allclose(np.asarray(mu_a), np.asarray(mu_b), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sd_a), np.asarray(sd_b), atol=1e-4)


def test_bayes_minimize_quadratic():
    """GP-EI must localize the minimum of a smooth 2-D bowl far better than
    its init design alone would."""
    target = np.array([0.3, 0.7])

    def fn(p):
        return float(np.sum((p - target) ** 2))

    res = bayes_minimize(fn, [(0.0, 1.0), (0.0, 1.0)], num_init=6, num_iters=12, seed=0)
    assert res.best_y < 0.01, (res.best_x, res.best_y)
    assert np.all(np.abs(res.best_x - target) < 0.15)
    assert len(res.ys) == 18


def test_bayes_minimize_handles_nonfinite():
    """Non-finite objective values are capped, not propagated into the GP."""
    calls = [0]

    def fn(p):
        calls[0] += 1
        return float("inf") if p[0] < 0.5 else float(p[0])

    res = bayes_minimize(fn, [(0.0, 1.0)], num_init=4, num_iters=4, seed=1)
    assert np.isfinite(res.ys).all()
    assert np.isfinite(res.best_y)


def test_bayes_search_sampler_smoke():
    """End-to-end (ε, β, M) search on a small Gaussian: table recorded,
    best entry finite and drawn from the allowed M grid."""
    dist = Gaussian(ndims=2, log_conditioning=1.0)
    res = bayes_search(
        dist,
        sampler="mjhmc",
        m_grid=(3, 5),
        num_init=3,
        num_iters=3,
        num_steps=200,
        nbatch=64,
        nlags=50,
        seed=0,
    )
    assert len(res.table) == 6
    assert np.isfinite(res.best["decay_evals"])
    assert res.best["num_leapfrog_steps"] in (3, 5)
    assert 0.01 <= res.best["epsilon"] <= 10.0
