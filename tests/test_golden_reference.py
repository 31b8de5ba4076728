"""TPU MJHMC vs the trusted NumPy reference implementation (SURVEY.md §4.6).

Distributional agreement (different RNG streams, so moments/operator
frequencies/autocorrelation must match within Monte-Carlo error — the same
acceptance criterion BASELINE.json sets against the reference repo).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.diagnostics import weighted_autocorrelation
from mjhmc_tpu.models import Gaussian
from mjhmc_tpu.samplers import MarkovJumpHMC

from reference_impl import numpy_mjhmc


def _gaussian_np(dist):
    prec = 1.0 / np.asarray(dist.variances, np.float64)[:, None]

    def u_fn(x):
        return 0.5 * (x * x * prec).sum(axis=0)

    def grad_u(x):
        return x * prec

    return u_fn, grad_u


def test_mjhmc_matches_numpy_reference():
    dist = Gaussian(ndims=2, log_conditioning=1.0)
    eps, beta, m = 0.6, 0.25, 5
    n, steps = 256, 1500

    # --- golden run --------------------------------------------------------
    rng = np.random.default_rng(0)
    u_fn, grad_u = _gaussian_np(dist)
    x0 = np.sqrt(np.asarray(dist.variances))[:, None] * rng.standard_normal((2, n))
    xs_np, w_np, sel_np = numpy_mjhmc(u_fn, grad_u, x0, eps, beta, m, steps, rng)

    # --- TPU-path run ------------------------------------------------------
    s = MarkovJumpHMC(
        dist, epsilon=eps, beta=beta, num_leapfrog_steps=m, nbatch=n, seed=1
    )
    out = s.sample(steps)
    xs_j = np.asarray(out["x"])
    w_j = np.asarray(out["dwell"])
    sel_j = np.asarray(out["sel"])

    # operator firing frequencies agree
    freq_np = np.bincount(sel_np.ravel(), minlength=3) / sel_np.size
    freq_j = np.bincount(sel_j.ravel(), minlength=3) / sel_j.size
    np.testing.assert_allclose(freq_j, freq_np, atol=0.02)

    # dwell-weight distributions agree (mean + spread)
    assert abs(w_j.mean() - w_np.mean()) < 0.03 * w_np.mean()
    assert abs(w_j.std() - w_np.std()) < 0.1 * w_np.std()

    # dwell-weighted posterior moments agree with each other and the truth
    def moments(xs, w):
        ww = w[:, None, :]
        mean = (ww * xs).sum(axis=(0, 2)) / ww.sum()
        var = (ww * xs**2).sum(axis=(0, 2)) / ww.sum() - mean**2
        return mean, var

    burn = 200
    m_np, v_np = moments(xs_np[burn:], w_np[burn:])
    m_j, v_j = moments(xs_j[burn:], w_j[burn:])
    tgt = np.asarray(dist.analytic_var())
    np.testing.assert_allclose(v_np, tgt, rtol=0.15)
    np.testing.assert_allclose(v_j, tgt, rtol=0.15)
    np.testing.assert_allclose(v_j, v_np, rtol=0.2)

    # autocorrelation spectra agree within MC error
    rho_np = np.asarray(
        weighted_autocorrelation(
            jnp.asarray(xs_np[burn:], jnp.float32),
            jnp.asarray(w_np[burn:], jnp.float32),
            nlags=40,
        )
    )
    rho_j = np.asarray(
        weighted_autocorrelation(
            jnp.asarray(xs_j[burn:], jnp.float32),
            jnp.asarray(w_j[burn:], jnp.float32),
            nlags=40,
        )
    )
    assert np.abs(rho_j - rho_np).max() < 0.1, np.abs(rho_j - rho_np).max()
