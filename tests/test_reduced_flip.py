"""Reduced-flip HMC continuous-state tests (SURVEY.md §2.4 variant).

The exact finite-state checks live in test_ladder.py (stationarity of the
reduced-flip transition matrix to 1e-12); here the continuous-state
implementation is checked for stationarity on Gaussians, the 2M cost
model, and the small-ε limit where the flip probability vanishes.
"""

import numpy as np

from mjhmc_tpu.models import Gaussian
from mjhmc_tpu.samplers import ReducedFlipHMC


def test_gaussian_moments():
    dist = Gaussian(ndims=4, log_conditioning=1.5)
    s = ReducedFlipHMC(
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


def test_eval_counter_is_two_trajectories():
    """Reduced-flip honestly costs 2M per iteration: the per-step momentum
    corruption invalidates any backward-energy cache (module docstring)."""
    dist = Gaussian(ndims=2)
    s = ReducedFlipHMC(dist, num_leapfrog_steps=7, nbatch=32)
    s.sample(13)
    assert s.grad_evals == 13 * 2 * 7 * 32


def test_small_eps_never_flips():
    """ε→0 ⇒ p_leap→1 both directions ⇒ p_flip = max(0, 1−1) = 0: the chain
    should essentially always leap and never flip or stay."""
    dist = Gaussian(ndims=2, log_conditioning=0.0)
    s = ReducedFlipHMC(
        dist, epsilon=0.01, beta=0.5, num_leapfrog_steps=3, nbatch=64
    )
    out = s.sample(50)
    sel = np.asarray(out["sel"])
    assert (sel == 0).mean() > 0.999


def test_flips_rarer_than_control_hmc():
    """The point of the variant: at identical (ε, β, M) operating points the
    reduced-flip chain reverses direction less often than flip-on-reject
    control HMC (flip prob max(0, p_b − p_f) ≤ 1 − p_f pointwise)."""
    from mjhmc_tpu.samplers import ControlHMC

    dist = Gaussian(ndims=8, log_conditioning=2.0)
    kw = dict(epsilon=0.35, beta=0.2, num_leapfrog_steps=5, nbatch=512, seed=1)
    rf = ReducedFlipHMC(dist, **kw)
    ctl = ControlHMC(dist, **kw)
    rf.burn_in(200)
    ctl.burn_in(200)
    rf_out = rf.sample(400)
    ctl_out = ctl.sample(400)
    rf_fliprate = float((np.asarray(rf_out["sel"]) == 1).mean())
    ctl_fliprate = float(1.0 - np.asarray(ctl_out["accept"]).mean())
    assert rf_fliprate < ctl_fliprate
