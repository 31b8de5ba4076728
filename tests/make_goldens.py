"""Freeze golden autocorrelation spectra from the trusted NumPy oracle.

SURVEY.md §4.6: "store reference curves produced by a trusted NumPy
re-implementation" — the oracle (tests/reference_impl.py) already runs at
test time; this script additionally COMMITS its output so a simultaneous
drift in both live implementations is visible (VERDICT round-1 missing #5).

Everything here is pure NumPy (sampler AND autocorrelation estimator), so
the artifacts are independent of the JAX code paths they guard. Regenerate
with:  python tests/make_goldens.py   (writes tests/golden/*.npz)
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reference_impl import numpy_mjhmc  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def numpy_median_autocorrelation(x, w, nlags):
    """Robust spectrum: per-(dim, chain) self-normalized autocorrelation,
    MEDIAN across all (dim, chain) pairs at each lag.

    For heavy-tailed targets (product-of-t at ν=2.5 has infinite kurtosis)
    the pooled estimator is dominated by the few most extreme chains and
    does not self-average — its value swings by ~0.15 between seeds at any
    practical chain count. The median curve is stable across realizations
    and is what the golden comparison pins for such targets.
    """
    t = x.shape[0]
    wx = w[:, None, :]
    mu = (wx * x).sum(axis=0, keepdims=True) / wx.sum(axis=0, keepdims=True)
    xc = (x - mu) * wx
    nfft = 1
    while nfft < 2 * t:
        nfft *= 2
    fa = np.fft.rfft(xc, n=nfft, axis=0)
    num = np.fft.irfft(np.conj(fa) * fa, n=nfft, axis=0)[:nlags]
    fw = np.fft.rfft(wx, n=nfft, axis=0)
    den = np.fft.irfft(np.conj(fw) * fw, n=nfft, axis=0)[:nlags]
    gamma = num / np.maximum(den, 1e-30)  # (nlags, d, n)
    rho = gamma / np.maximum(gamma[0], 1e-30)
    return np.median(rho, axis=(1, 2))


def numpy_weighted_autocorrelation(x, w, nlags):
    """Pure-NumPy mirror of diagnostics.autocorr.weighted_autocorrelation:
    γ(τ) = Σ w_t w_{t+τ} dx_t dx_{t+τ} / Σ w_t w_{t+τ}, dims+chains pooled."""
    t = x.shape[0]
    wx = w[:, None, :]
    mu = (wx * x).sum(axis=(0, 2), keepdims=True) / wx.sum(axis=(0, 2), keepdims=True)
    xc = (x - mu) * wx
    nfft = 1
    while nfft < 2 * t:
        nfft *= 2
    fa = np.fft.rfft(xc, n=nfft, axis=0)
    num = np.fft.irfft(np.conj(fa) * fa, n=nfft, axis=0)[:nlags]
    wb = np.broadcast_to(w[:, None, :], x.shape)
    fw = np.fft.rfft(wb, n=nfft, axis=0)
    den = np.fft.irfft(np.conj(fw) * fw, n=nfft, axis=0)[:nlags]
    gamma = num.sum(axis=(1, 2)) / np.maximum(den.sum(axis=(1, 2)), 1e-30)
    return gamma / gamma[0]


def _gaussian(ndims=2, log_conditioning=2.0):
    var = np.logspace(0.0, log_conditioning, ndims)

    def u(x):
        return 0.5 * (x * x / var[:, None]).sum(axis=0)

    def g(x):
        return x / var[:, None]

    def init(rng, n):
        return np.sqrt(var)[:, None] * rng.standard_normal((ndims, n))

    return u, g, init


def _rough_well(s1=100.0, s2=4.0, amp=1.0):
    def u(x):
        return (0.5 * x * x / s1**2 + amp * np.cos(x / s2)).sum(axis=0)

    def g(x):
        return x / s1**2 - (amp / s2) * np.sin(x / s2)

    def init(rng, n):
        return s1 * rng.standard_normal((2, n))

    return u, g, init


def _product_of_t(ndims=36, nu=2.5, seed=0):
    # same basis construction as models/product_of_t.py (seeded host RNG)
    from mjhmc_tpu.models.product_of_t import ProductOfT

    dist = ProductOfT(ndims=ndims, nbasis=ndims)
    w_basis = np.asarray(dist._basis, np.float64)
    nu = float(dist.nu)

    def u(x):
        y = w_basis.T @ x
        return (0.5 * (nu + 1.0) * np.log1p(y * y / nu)).sum(axis=0)

    def g(x):
        y = w_basis.T @ x
        return w_basis @ ((nu + 1.0) * y / (nu + y * y))

    def init(rng, n):
        return rng.standard_normal((ndims, n))

    return u, g, init


def _sparse_coding():
    from mjhmc_tpu.models.sparse_coding import SparseCoding

    dist = SparseCoding()  # pretrained Φ artifact
    phi = np.asarray(dist._phi, np.float64)
    patch = np.asarray(dist._patch, np.float64)[:, None]
    lam, sig2, eps2 = dist.lam, dist.sigma**2, dist.smooth_eps

    def u(a):
        s = np.sqrt(a * a + eps2)
        r = patch - phi @ a
        return lam * s.sum(axis=0) + 0.5 / sig2 * (r * r).sum(axis=0)

    def g(a):
        s = np.sqrt(a * a + eps2)
        r = patch - phi @ a
        return lam * a / s - (phi.T @ r) / sig2

    def init(rng, n):
        return 0.1 * rng.standard_normal((dist.nbasis, n))

    return u, g, init


#: the 4 reference distributions (SURVEY.md §2.2), pinned params/seeds
CASES = {
    "gaussian_2d": dict(make=_gaussian, eps=1.0, beta=0.1, m=5,
                        steps=1500, nbatch=256, nlags=100, burn=200),
    "rough_well": dict(make=_rough_well, eps=1.0, beta=0.1, m=10,
                       steps=1500, nbatch=256, nlags=100, burn=200),
    # nbatch matters here: ν=2.5 has infinite kurtosis, so the pooled
    # autocorrelation estimator is dominated by the most extreme chains
    # and its expectation over realizations shifts with chain count —
    # pin it at the fused engine's minimum batch (1024) so the golden,
    # the jnp path, and the engine all compare at the same nbatch
    "product_of_t": dict(make=_product_of_t, eps=0.12, beta=0.1, m=5,
                         steps=1200, nbatch=1024, nlags=100, burn=200),
    "sparse_coding": dict(make=_sparse_coding, eps=0.02, beta=0.1, m=5,
                          steps=1200, nbatch=192, nlags=100, burn=200),
}


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, c in CASES.items():
        u, g, init = c["make"]()
        rng = np.random.default_rng(12345)
        x0 = init(rng, c["nbatch"])
        # burn with the oracle itself, then measure
        xs, dwell, _ = numpy_mjhmc(
            u, g, x0, c["eps"], c["beta"], c["m"], c["burn"], rng
        )
        x_burned = xs[-1]
        xs, dwell, sel = numpy_mjhmc(
            u, g, x_burned, c["eps"], c["beta"], c["m"], c["steps"], rng
        )
        rho = numpy_weighted_autocorrelation(xs, dwell, c["nlags"])
        rho_med = numpy_median_autocorrelation(xs, dwell, c["nlags"])
        op_freq = np.bincount(sel.ravel(), minlength=3) / sel.size
        out = os.path.join(GOLDEN_DIR, f"autocorr_{name}.npz")
        np.savez(
            out,
            rho=rho.astype(np.float32),
            rho_med=rho_med.astype(np.float32),
            dwell_mean=np.float32(dwell.mean()),
            op_freq=op_freq.astype(np.float32),
            epsilon=np.float32(c["eps"]),
            beta=np.float32(c["beta"]),
            m=np.int32(c["m"]),
            steps=np.int32(c["steps"]),
            nbatch=np.int32(c["nbatch"]),
            nlags=np.int32(c["nlags"]),
            burn=np.int32(c["burn"]),
        )
        print(json.dumps({
            "name": name, "path": out,
            "rho_head": [float(v) for v in rho[:4]],
            "dwell_mean": float(dwell.mean()),
            "op_freq": [float(v) for v in op_freq],
        }), flush=True)


if __name__ == "__main__":
    main()
