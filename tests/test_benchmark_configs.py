"""End-to-end runs of the five named BASELINE configs (downscaled for CI).

Each config exercises its full intended pipeline: the distribution, the
sampler(s), adaptation where specified, diagnostics, and (config 5) the
sharded layout — the line-by-line capability checklist.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjhmc_tpu.config import BENCHMARK_CONFIGS
from mjhmc_tpu.diagnostics import (
    effective_sample_size,
    empirical_spectral_gap,
    weighted_autocorrelation,
)
from mjhmc_tpu.samplers import (
    ControlHMC,
    MarkovJumpHMC,
    NUTS,
    make_mj_state,
    make_nuts_state,
)
from mjhmc_tpu.samplers.adaptation import adaptive_mjhmc_run, da_epsilon, da_init


def test_config1_gauss2d_mjhmc_vs_control():
    cfg = BENCHMARK_CONFIGS["gauss2d"]
    dist = cfg.make_distribution()
    tgt = np.asarray(dist.analytic_var())
    for cls in (MarkovJumpHMC, ControlHMC):
        s = cls(dist, epsilon=cfg.epsilon, beta=cfg.beta,
                num_leapfrog_steps=cfg.num_leapfrog_steps, nbatch=cfg.nbatch)
        s.burn_in(300)
        out = s.sample(1500)
        xs = np.asarray(out["x"])
        w = out.get("dwell")
        ww = np.asarray(w)[:, None, :] if w is not None else np.ones_like(xs[:, :1])
        var = (ww * xs**2).sum(axis=(0, 2)) / ww.sum()
        np.testing.assert_allclose(var, tgt, rtol=0.25)


def test_config2_rough_well_fidelity():
    cfg = BENCHMARK_CONFIGS["rough_well"]
    dist = cfg.make_distribution()
    s = MarkovJumpHMC(dist, epsilon=4.0, beta=0.05,
                      num_leapfrog_steps=cfg.num_leapfrog_steps, nbatch=512)
    s.burn_in(400)
    out = s.sample(2500)
    xs, w = np.asarray(out["x"]), np.asarray(out["dwell"])[:, None, :]
    var = (w * xs**2).sum(axis=(0, 2)) / w.sum()
    np.testing.assert_allclose(var, np.asarray(dist.analytic_var()), rtol=0.2)


def test_config3_product_of_t_mjhmc_and_nuts_with_adaptation():
    cfg = BENCHMARK_CONFIGS["product_of_t"]
    dist = cfg.make_distribution()
    n = 256

    # adaptive MJHMC warmup then frozen sampling
    st = make_mj_state(dist, jax.random.key(0), n)
    da = da_init(cfg.epsilon)
    run = jax.jit(lambda s, d, k: adaptive_mjhmc_run(
        dist, s, d, k, 300, cfg.beta, cfg.num_leapfrog_steps))
    st, da, _ = run(st, da, jax.random.key(1))
    eps = float(da_epsilon(da, frozen=True))
    assert 1e-3 < eps < 5.0

    s = MarkovJumpHMC(dist, epsilon=eps, beta=cfg.beta,
                      num_leapfrog_steps=cfg.num_leapfrog_steps, nbatch=n)
    s.state = st
    out = s.sample(600)
    assert np.isfinite(np.asarray(out["x"])).all()

    # NUTS baseline on the same energy
    nuts = NUTS(dist, epsilon=eps, max_depth=6, nbatch=128)
    nout = nuts.sample(100)
    assert np.isfinite(np.asarray(nout["x"])).all()
    assert float(np.asarray(nout["accept_stat"]).mean()) > 0.3


def test_config4_gauss50d_diagnostics_on_device():
    cfg = BENCHMARK_CONFIGS["gauss50d"]
    dist = cfg.make_distribution()
    s = MarkovJumpHMC(dist, epsilon=cfg.epsilon, beta=cfg.beta,
                      num_leapfrog_steps=cfg.num_leapfrog_steps, nbatch=256)
    s.burn_in(300)
    out = s.sample(1200)
    xs = jnp.asarray(out["x"])
    w = jnp.asarray(out["dwell"])
    rho = np.asarray(weighted_autocorrelation(xs, w, nlags=100))
    assert rho[0] == pytest.approx(1.0, abs=1e-5)
    ess = float(effective_sample_size(xs, w))
    assert ess > 100
    gap = empirical_spectral_gap(xs, w)
    assert 0.0 < gap <= 1.0


def test_config5_sparse_coding_sharded_with_resampling():
    from mjhmc_tpu.parallel.collectives import distributed_systematic_resample
    from mjhmc_tpu.parallel.mesh import chain_sharding, make_chain_mesh

    cfg = BENCHMARK_CONFIGS["sparse_coding"]
    dist = cfg.make_distribution()
    mesh = make_chain_mesh(8)
    n = 64
    s = MarkovJumpHMC(dist, epsilon=cfg.epsilon, beta=cfg.beta,
                      num_leapfrog_steps=3, nbatch=n)
    out = s.sample(20)
    assert np.isfinite(np.asarray(out["x"])).all()
    # SMC-style resampling of the sharded chain states by dwell weight
    x = jax.device_put(s.state.chain.x, chain_sharding(mesh, 2))
    log_w = jax.device_put(
        jnp.log(jnp.asarray(out["dwell"])[-1]), chain_sharding(mesh, 1)
    )
    xr = jax.jit(
        lambda k, x, lw: distributed_systematic_resample(k, x, lw, mesh)
    )(jax.random.key(3), x, log_w)
    assert xr.shape == x.shape and np.isfinite(np.asarray(xr)).all()
