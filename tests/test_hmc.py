"""Control HMC stationarity tests (SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.models import Gaussian
from mjhmc_tpu.samplers import ControlHMC, make_hmc_state, hmc_run


def test_gaussian_moments():
    dist = Gaussian(ndims=4, log_conditioning=1.5)
    s = ControlHMC(
        dist, epsilon=0.5, beta=0.3, num_leapfrog_steps=5, nbatch=512, seed=0
    )
    s.burn_in(300)
    out = s.sample(1500)
    xs = np.asarray(out["x"])  # (T, d, n)
    mean = xs.mean(axis=(0, 2))
    var = xs.var(axis=(0, 2))
    tgt_var = np.asarray(dist.analytic_var())
    np.testing.assert_allclose(mean, 0.0, atol=3.5 * np.sqrt(tgt_var.max() / 500))
    np.testing.assert_allclose(var, tgt_var, rtol=0.15)


def test_accept_rate_reasonable():
    dist = Gaussian(ndims=2, log_conditioning=1.0)
    s = ControlHMC(dist, epsilon=0.3, beta=1.0, num_leapfrog_steps=5, nbatch=256)
    out = s.sample(200)
    acc = np.asarray(out["accept"]).mean()
    assert 0.7 < acc <= 1.0


def test_eval_counters():
    """Counters must equal steps × M exactly (SURVEY.md §4.4)."""
    dist = Gaussian(ndims=2)
    s = ControlHMC(dist, num_leapfrog_steps=7, nbatch=32)
    s.sample(13)
    assert s.grad_evals == 13 * 7 * 32


def test_small_eps_always_accepts():
    dist = Gaussian(ndims=2, log_conditioning=0.0)
    s = ControlHMC(dist, epsilon=0.01, beta=1.0, num_leapfrog_steps=3, nbatch=64)
    out = s.sample(50)
    assert np.asarray(out["accept"]).mean() > 0.999


def test_stats_collect_matches_samples():
    """Streaming moment accumulators == recomputation from full samples."""
    dist = Gaussian(ndims=3, log_conditioning=1.0)
    key = jax.random.key(3)
    from mjhmc_tpu.samplers import make_hmc_state

    st0 = make_hmc_state(dist, key, 64)
    krun = jax.random.key(4)
    st_a, out_a = hmc_run(dist, st0, krun, 40, 0.4, 0.5, 5)
    st_b, out_b = hmc_run(dist, st0, krun, 40, 0.4, 0.5, 5, collect="stats")
    acc = out_b["moments"]
    xs = np.asarray(out_a["x"])
    np.testing.assert_allclose(
        np.asarray(acc.mean()), xs.mean(axis=(0, 2)), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(acc.var()), xs.var(axis=(0, 2)), rtol=1e-3, atol=1e-5
    )
