"""Pin the COMMITTED paper-figure bundle to its oracles (VERDICT r4 item 8).

docs/figures/paper_bundle/*.npz was generated on-chip (round 4); merely
committing artifacts proves presence, not correctness. These tests make
the bundle VERIFIABLE:

  - spectral_gap.npz is recomputed on CPU: the ladder energies come
    from a backend-independent threefry key and the eigendecompositions
    are host-side NumPy f64 (diagnostics/spectral.py docstring), so the
    committed curves must match the eigensolution to 1e-4 (the only
    slack is the f32 normal draw's last-ulp backend difference);
  - tempering.npz's ``exact`` density is re-derived analytically, and
    the committed histograms must show the paper's qualitative claim —
    PT recovers both modes from a one-basin init while plain HMC stays
    stuck behind the ≈12.5 kT barrier;
  - autocorr_overlay.npz: a CPU rerun of the gaussian_2d row at the
    bundle's own recorded operating points must reproduce the committed
    ρ curves (early lags) and decay times to MC tolerance — pinning the
    on-chip artifact to the XLA reference path that the golden NumPy
    spectra (tests/golden/, test_golden_spectra.py) already certify;
  - structural invariants (ρ(0)=1, monotone eval axes, finite curves)
    for every committed row.
"""

import os

import numpy as np
import pytest

import jax

from mjhmc_tpu.diagnostics.spectral import (
    spectral_gap_continuous,
    spectral_gap_discrete,
)
from mjhmc_tpu.experiments.autocorr_experiment import (
    _decay_time,
    calculate_autocorrelation,
)
from mjhmc_tpu.samplers.algebraic import (
    continuous_rate_matrix,
    discrete_transition_matrix,
    random_ladder_energies,
    reduced_flip_transition_matrix,
)

BUNDLE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "figures", "paper_bundle",
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BUNDLE), reason="paper bundle not committed"
)


def test_spectral_gap_npz_matches_eigensolution():
    z = np.load(os.path.join(BUNDLE, "spectral_gap.npz"))
    ks, betas = z["ks"], z["betas"]
    # regenerate with the figure's protocol (figures.fig_spectral_gap,
    # non-quick: n_draws=10, K-sweep at beta=0.3, beta-sweep at K=16,
    # draw keys d and 100+d)
    n_draws = 10
    for i, k in enumerate(ks):
        gc, gr, gd = [], [], []
        for d in range(n_draws):
            e = random_ladder_energies(jax.random.key(d), int(k))
            gc.append(spectral_gap_continuous(continuous_rate_matrix(e, 0.3)))
            gr.append(
                spectral_gap_discrete(reduced_flip_transition_matrix(e, 0.3))
            )
            gd.append(
                spectral_gap_discrete(discrete_transition_matrix(e, 0.3))
            )
        np.testing.assert_allclose(z["cont_k"][i], np.mean(gc), rtol=1e-4)
        np.testing.assert_allclose(z["rf_k"][i], np.mean(gr), rtol=1e-4)
        np.testing.assert_allclose(z["disc_k"][i], np.mean(gd), rtol=1e-4)
    for i, b in enumerate(betas):
        gc, gr, gd = [], [], []
        for d in range(n_draws):
            e = random_ladder_energies(jax.random.key(100 + d), 16)
            gc.append(
                spectral_gap_continuous(continuous_rate_matrix(e, float(b)))
            )
            gr.append(
                spectral_gap_discrete(
                    reduced_flip_transition_matrix(e, float(b))
                )
            )
            gd.append(
                spectral_gap_discrete(discrete_transition_matrix(e, float(b)))
            )
        np.testing.assert_allclose(z["cont_b"][i], np.mean(gc), rtol=1e-4)
        np.testing.assert_allclose(z["rf_b"][i], np.mean(gr), rtol=1e-4)
        np.testing.assert_allclose(z["disc_b"][i], np.mean(gd), rtol=1e-4)


def test_tempering_npz_exact_density_and_mode_recovery():
    import jax.numpy as jnp

    from mjhmc_tpu.models import GaussianMixture

    z = np.load(os.path.join(BUNDLE, "tempering.npz"))
    grid, exact = z["grid"], z["exact"]
    dist = GaussianMixture()
    recomputed = np.exp(
        -np.asarray(dist.potential(jnp.asarray(grid)[None, :]), np.float64)
    )
    recomputed /= np.trapezoid(recomputed, grid)
    # analytic density: identical formula, f32 eval on-chip → loose atol
    np.testing.assert_allclose(exact, recomputed, atol=1e-4)

    # the paper's claim, on the committed samples: PT splits its mass
    # across both modes (exact split is 50/50); stuck-init HMC never
    # crosses the ≈12.5 kT barrier
    right_pt = float(np.mean(z["pt"] > 0.0))
    right_hmc = float(np.mean(z["hmc"] > 0.0))
    assert 0.3 < right_pt < 0.7, right_pt
    assert right_hmc < 0.05, right_hmc
    # committed swap rates: every adjacent-temperature pair must actually
    # exchange (a dead rung would disconnect the ladder)
    assert (z["swap_rates"] > 0.05).all()


def test_autocorr_overlay_gaussian_row_reproduces_on_cpu():
    z = np.load(os.path.join(BUNDLE, "autocorr_overlay.npz"))
    from mjhmc_tpu.models import Gaussian

    dist = Gaussian(ndims=2, log_conditioning=2.0)
    for sampler in ("mjhmc", "control", "malt"):
        eps, b, m = z[f"gaussian_2d_{sampler}_params"]
        kw = {"gamma" if sampler == "malt" else "beta": float(b)}
        res = calculate_autocorrelation(
            dist, sampler, num_steps=1500, nbatch=256,
            nlags=min(200, len(z[f"gaussian_2d_{sampler}_rho"])),
            use_cached_init=False, seed=3,
            epsilon=float(eps), num_leapfrog_steps=int(m), **kw,
        )
        rho_ref = z[f"gaussian_2d_{sampler}_rho"]
        evals_ref = z[f"gaussian_2d_{sampler}_evals"]
        n = min(30, len(res.rho), len(rho_ref))
        # early-lag agreement to MC tolerance (independent seeds/backends)
        assert np.max(np.abs(res.rho[:n] - rho_ref[:n])) < 0.15, sampler
        # decay times agree within MC factor
        d_ref = _decay_time(evals_ref, rho_ref)
        d_new = _decay_time(res.grad_evals[: len(res.rho)], res.rho)
        if np.isfinite(d_ref) and np.isfinite(d_new):
            assert 0.4 < d_new / d_ref < 2.5, (sampler, d_new, d_ref)


def test_bundle_structural_invariants():
    z = np.load(os.path.join(BUNDLE, "autocorr_overlay.npz"))
    names = sorted(
        {k.rsplit("_", 1)[0] for k in z.files if k.endswith("_rho")}
    )
    assert len(names) == 12  # 4 distributions × 3 samplers
    for name in names:
        rho, evals = z[f"{name}_rho"], z[f"{name}_evals"]
        assert np.isfinite(rho).all() and np.isfinite(evals).all(), name
        assert abs(rho[0] - 1.0) < 0.02, name
        assert (np.diff(evals) > 0).all(), name  # exact eval axis: monotone
    fan = np.load(os.path.join(BUNDLE, "trajectory_fan.npz"))
    for key in ("mjhmc", "control_hmc"):
        xs = fan[key]
        assert xs.shape[1] == 2 and np.isfinite(xs).all()
        # the rough-well chains actually explore (not a frozen scatter)
        assert np.std(xs) > 10.0
