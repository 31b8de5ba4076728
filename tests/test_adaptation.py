"""Dual-averaging adaptation tests (SURVEY.md §2.9 / BASELINE config 3)."""

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.models import Gaussian, ProductOfT
from mjhmc_tpu.samplers import make_hmc_state, make_mj_state
from mjhmc_tpu.samplers.adaptation import (
    adaptive_hmc_run,
    adaptive_mjhmc_run,
    da_epsilon,
    da_init,
    da_update,
)
from mjhmc_tpu.samplers.hmc import hmc_run


def test_da_update_monotone_response():
    """Acceptance above target must raise ε, below target must lower it."""
    da_hi = da_init(0.5)
    da_lo = da_init(0.5)
    for _ in range(20):
        da_hi = da_update(da_hi, jnp.float32(0.99), target=0.65)
        da_lo = da_update(da_lo, jnp.float32(0.10), target=0.65)
    assert float(da_epsilon(da_hi)) > 0.5
    assert float(da_epsilon(da_lo)) < 0.5


def test_hmc_adaptation_reaches_target():
    dist = Gaussian(ndims=10, log_conditioning=2.0)
    state = make_hmc_state(dist, jax.random.key(0), 256)
    da = da_init(8.0)  # deliberately unstable starting ε
    run = jax.jit(
        lambda s, d, k: adaptive_hmc_run(dist, s, d, k, 400, 1.0, 5, 0.65)
    )
    state, da, aux = run(state, da, jax.random.key(1))
    eps = float(da_epsilon(da, frozen=True))
    assert 0.005 < eps < 4.0  # pulled back below the stability limit
    # verify the frozen ε actually achieves ~target acceptance
    state2, out = hmc_run(
        dist, state, jax.random.key(2), 200, eps, 1.0, 5
    )
    acc = float(np.asarray(out["accept_stat"]).mean())
    assert 0.45 < acc < 0.95, acc


def test_mjhmc_adaptation_runs_and_stabilizes():
    dist = ProductOfT(ndims=8, nbasis=8, nu=4.0)
    state = make_mj_state(dist, jax.random.key(3), 128)
    da = da_init(2.0)
    run = jax.jit(
        lambda s, d, k: adaptive_mjhmc_run(dist, s, d, k, 300, 0.1, 5, 0.65)
    )
    state, da, aux = run(state, da, jax.random.key(4))
    eps_trace = np.asarray(aux["eps_trace"])
    assert np.isfinite(eps_trace).all()
    # late-phase ε varies slowly (dual averaging converging)
    late = eps_trace[-100:]
    assert late.std() / late.mean() < 0.5
    assert 1e-4 < float(da_epsilon(da, frozen=True)) < 10.0
