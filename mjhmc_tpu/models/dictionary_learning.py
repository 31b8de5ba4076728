"""On-device dictionary pretraining for the sparse-coding posterior.

The reference ships a dictionary Φ *pre-trained on natural-image patches*
as a data file (SURVEY.md §2.2d / :116). With no network and an empty
reference mount, the faithful move is to PRETRAIN Φ here and persist it as
the config-5 data artifact — not to substitute a hand-built filter bank.

Training data: seeded synthetic patches with the canonical natural-image
statistic — a 1/f amplitude spectrum (Field 1987, "Relations between the
statistics of natural images...") — generated on-device in the training
loop (white noise shaped in the Fourier domain, per-patch normalized).

Learner: the classical sparse-coding alternation (Olshausen & Field 1996),
TPU-native — everything is one jitted ``lax.scan``:

  E(a, Φ) = λ Σ|a|  +  ½σ⁻² ‖x − Φa‖²      (the same energy family the
                                             posterior samples over)
  inner:  ISTA on a (fixed iteration count, MXU matmuls)
  outer:  gradient step on Φ from the reconstruction residual,
          columns renormalized to unit norm each step

The result is saved to ``mjhmc_tpu/data/phi_<p>x<b>.npz`` and loaded by
``models.sparse_coding.SparseCoding`` as its default Φ.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


def _phi_path(npixels: int, nbasis: int) -> str:
    return os.path.join(DATA_DIR, f"phi_{npixels}x{nbasis}.npz")


# ---------------------------------------------------------------------------
# 1/f natural-image-statistics patches (on-device)
# ---------------------------------------------------------------------------
def natural_patches(key: Array, n: int, side: int, alpha: float = 1.0) -> Array:
    """(side², n) patches with a 1/f^alpha amplitude spectrum.

    White complex noise in the Fourier domain, shaped by the radial
    envelope |f|^-alpha (DC zeroed), inverse-transformed, then per-patch
    mean-centered and normalized to unit std — the standard synthetic
    stand-in for whitened natural-image patches.
    """
    kr, ki = jax.random.split(key)
    fx = jnp.fft.fftfreq(side)
    rad = jnp.sqrt(fx[:, None] ** 2 + fx[None, :] ** 2)
    amp = jnp.where(rad > 0, 1.0 / jnp.maximum(rad, 1e-6) ** alpha, 0.0)
    noise = jax.random.normal(
        kr, (n, side, side), jnp.float32
    ) + 1j * jax.random.normal(ki, (n, side, side), jnp.float32)
    img = jnp.real(jnp.fft.ifft2(noise * amp[None]))  # (n, side, side)
    img = img - jnp.mean(img, axis=(1, 2), keepdims=True)
    img = img / (jnp.std(img, axis=(1, 2), keepdims=True) + 1e-8)
    return img.reshape(n, side * side).T.astype(jnp.float32)  # (p, n)


# ---------------------------------------------------------------------------
# ISTA inner loop + dictionary outer loop
# ---------------------------------------------------------------------------
def _soft(a: Array, t: Array) -> Array:
    return jnp.sign(a) * jnp.maximum(jnp.abs(a) - t, 0.0)


def _lambda_max(phi: Array, iters: int = 8) -> Array:
    """λmax(ΦᵀΦ) by power iteration (the Frobenius bound is ~b/λmax× too
    loose for overcomplete unit-norm Φ, which stalls fixed-count ISTA)."""
    v = jnp.ones((phi.shape[1],), jnp.float32) / np.sqrt(phi.shape[1])

    def body(v, _):
        w = phi.T @ (phi @ v)
        return w / (jnp.linalg.norm(w) + 1e-12), None

    v, _ = jax.lax.scan(body, v, None, length=iters)
    return jnp.dot(v, phi.T @ (phi @ v))


def ista_codes(
    phi: Array, x: Array, lam: float, sigma: float, num_iters: int
) -> Array:
    """Sparse codes minimizing λ‖a‖₁ + ½σ⁻²‖x − Φa‖² (fixed-count ISTA),
    step size 1/L with L = σ⁻²·λmax(ΦᵀΦ) (power-iterated, 10% margin)."""
    lstep = (sigma**2) / (1.1 * _lambda_max(phi))
    a0 = jnp.zeros((phi.shape[1], x.shape[1]), jnp.float32)

    def body(a, _):
        resid = x - phi @ a
        a = _soft(a + lstep / (sigma**2) * (phi.T @ resid), lstep * lam)
        return a, None

    a, _ = jax.lax.scan(body, a0, None, length=num_iters)
    return a


class DictLearnOut(NamedTuple):
    phi: Array  # (npixels, nbasis), unit-norm columns
    recon_err: Array  # (num_steps,) mean ‖x−Φa‖²/p per step
    code_l0: Array  # (num_steps,) mean active fraction of a


def learn_dictionary(
    key: Array,
    npixels: int = 64,
    nbasis: int = 128,
    num_steps: int = 400,
    batch: int = 256,
    lam: float = 8.0,
    sigma: float = 0.316,
    lr: float = 1.5,
    ista_iters: int = 40,
    alpha: float = 1.0,
) -> DictLearnOut:
    """Olshausen-Field alternating minimization, one jitted scan.

    λ/σ are the *learning* hyperparameters — the activation threshold for
    a unit-norm atom is ≈ λσ² (≈0.5 at the defaults), giving ~5-15% active
    codes on unit-std patches; the posterior's λ/σ live on SparseCoding.
    """
    side = int(round(np.sqrt(npixels)))
    assert side * side == npixels, "npixels must be a perfect square"
    k0, kloop = jax.random.split(key)
    phi0 = jax.random.normal(k0, (npixels, nbasis), jnp.float32)
    phi0 = phi0 / jnp.linalg.norm(phi0, axis=0, keepdims=True)

    @jax.jit
    def run(phi0, kloop):
        def step(phi, k):
            x = natural_patches(k, batch, side, alpha)
            a = ista_codes(phi, x, lam, sigma, ista_iters)
            resid = x - phi @ a  # (p, batch)
            # gradient ascent on reconstruction: Φ += η residual aᵀ / batch
            phi = phi + (lr / batch) * (resid @ a.T)
            phi = phi / (jnp.linalg.norm(phi, axis=0, keepdims=True) + 1e-8)
            err = jnp.mean(jnp.sum(resid * resid, axis=0)) / npixels
            l0 = jnp.mean(jnp.abs(a) > 1e-6)
            return phi, (err, l0)

        keys = jax.random.split(kloop, num_steps)
        phi, (errs, l0s) = jax.lax.scan(step, phi0, keys)
        return phi, errs, l0s

    phi, errs, l0s = run(phi0, kloop)
    return DictLearnOut(phi=phi, recon_err=errs, code_l0=l0s)


# ---------------------------------------------------------------------------
# artifact persistence (the reference's "Φ shipped as a data file")
# ---------------------------------------------------------------------------
def save_pretrained(phi: Array, meta: dict | None = None) -> str:
    phi = np.asarray(phi, np.float32)
    p, b = phi.shape
    os.makedirs(DATA_DIR, exist_ok=True)
    path = _phi_path(p, b)
    np.savez(path, phi=phi, **{f"meta_{k}": v for k, v in (meta or {}).items()})
    return path


def load_pretrained(npixels: int, nbasis: int) -> np.ndarray | None:
    """Packaged pretrained Φ for this shape, or None if not shipped."""
    path = _phi_path(npixels, nbasis)
    if not os.path.exists(path):
        return None
    return np.load(path)["phi"].astype(np.float32)


def main(argv=None):
    """Pretrain and persist the config-5 dictionary artifact."""
    import argparse
    import json

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--npixels", type=int, default=64)
    ap.add_argument("--nbasis", type=int, default=128)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args(argv)
    out = learn_dictionary(
        jax.random.key(a.seed),
        npixels=a.npixels,
        nbasis=a.nbasis,
        num_steps=a.steps,
        batch=a.batch,
    )
    path = save_pretrained(
        out.phi,
        {
            "seed": a.seed,
            "steps": a.steps,
            "final_recon_err": float(out.recon_err[-1]),
            "final_code_l0": float(out.code_l0[-1]),
        },
    )
    print(
        json.dumps(
            {
                "path": path,
                "recon_err_first": float(out.recon_err[0]),
                "recon_err_last": float(out.recon_err[-1]),
                "code_l0_last": float(out.code_l0[-1]),
            }
        )
    )
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
