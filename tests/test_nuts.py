"""NUTS tests: stationarity, tree-depth behavior, counters, divergences."""

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.models import Gaussian
from mjhmc_tpu.samplers import NUTS


def test_gaussian_moments():
    dist = Gaussian(ndims=4, log_conditioning=1.5)
    s = NUTS(dist, epsilon=0.4, max_depth=6, nbatch=256, seed=0)
    s.burn_in(100)
    out = s.sample(400)
    xs = np.asarray(out["x"])
    mean = xs.mean(axis=(0, 2))
    var = xs.var(axis=(0, 2))
    tgt = np.asarray(dist.analytic_var())
    np.testing.assert_allclose(mean, 0.0, atol=3.5 * np.sqrt(tgt.max() / 400))
    np.testing.assert_allclose(var, tgt, rtol=0.2)


def test_depth_scales_with_epsilon():
    """Smaller ε ⇒ more leapfrogs to the U-turn ⇒ deeper trees."""
    dist = Gaussian(ndims=2, log_conditioning=0.0)
    deep = NUTS(dist, epsilon=0.05, max_depth=7, nbatch=128, seed=1)
    shallow = NUTS(dist, epsilon=0.8, max_depth=7, nbatch=128, seed=1)
    d_deep = np.asarray(deep.sample(20)["depth"]).mean()
    d_shallow = np.asarray(shallow.sample(20)["depth"]).mean()
    assert d_deep > d_shallow + 1.0, (d_deep, d_shallow)


def test_counters_bounded_by_budget():
    dist = Gaussian(ndims=2)
    md, steps, n = 5, 10, 64
    s = NUTS(dist, epsilon=0.3, max_depth=md, nbatch=n)
    out = s.sample(steps)
    per_chain = np.asarray(s.state.grad_evals)
    assert (per_chain <= steps * (2**md - 1)).all()
    assert (per_chain >= steps).all()  # at least one leaf per iteration
    nl = np.asarray(out["x"]).shape  # smoke: output shape
    assert nl == (steps, 2, n)


def test_depth_matches_uturn_theory():
    """1-D standard normal: leapfrog rotates phase space at ω=ε/step and
    the whole-tree U-turn fires once the span reaches ~π/ε steps, so mean
    completed-depth sits a constant ~1-2 below log2(π/ε) (the final failed
    doubling is not counted; random directions overlap) and scales as
    −log2 ε."""
    depths = {}
    for eps in (0.05, 0.2):
        s = NUTS(Gaussian(ndims=1, log_conditioning=0.0), epsilon=eps,
                 max_depth=9, nbatch=256, seed=4)
        depths[eps] = float(np.asarray(s.sample(30)["depth"]).mean())
        expected = np.log2(np.pi / eps)
        assert expected - 2.5 < depths[eps] < expected + 0.5, (eps, depths[eps])
    # quartering ε adds ~2 doublings
    assert 1.0 < depths[0.05] - depths[0.2] < 2.6


def test_tight_invariance_1d():
    """High-precision stationarity: 1-D N(0,1), large sample, 2% tolerance
    on the second moment and 5% on the fourth (catches subtle tree bias)."""
    s = NUTS(Gaussian(ndims=1, log_conditioning=0.0), epsilon=0.35,
             max_depth=6, nbatch=512, seed=5)
    s.burn_in(100)
    xs = np.asarray(s.sample(2000)["x"]).ravel()
    m2, m4 = (xs**2).mean(), (xs**4).mean()
    assert abs(m2 - 1.0) < 0.02, m2
    assert abs(m4 - 3.0) < 0.15, m4


def test_divergence_detection():
    """Huge ε on an ill-conditioned target must flag divergences."""
    dist = Gaussian(ndims=10, log_conditioning=3.0)
    s = NUTS(dist, epsilon=50.0, max_depth=4, nbatch=64, seed=2)
    out = s.sample(10)
    assert np.asarray(out["diverged"]).any()


def test_no_divergence_small_eps():
    dist = Gaussian(ndims=2, log_conditioning=0.0)
    s = NUTS(dist, epsilon=0.05, max_depth=5, nbatch=64, seed=3)
    out = s.sample(10)
    assert not np.asarray(out["diverged"]).any()
    assert np.asarray(out["accept_stat"]).mean() > 0.95
