"""Dictionary pretraining + the shipped config-5 Φ artifact.

SURVEY.md §2.2d: the reference ships a *pre-trained* dictionary over
natural-image patches as a data file. Here Φ is pretrained on-device
(models/dictionary_learning.py) over 1/f natural-statistics patches and
persisted as package data; these tests pin (a) that learning actually
learns, (b) that the shipped artifact is valid and is what the default
SparseCoding posterior runs on.
"""

import jax
import numpy as np

from mjhmc_tpu.models.dictionary_learning import (
    ista_codes,
    learn_dictionary,
    load_pretrained,
    natural_patches,
)
from mjhmc_tpu.models.sparse_coding import SparseCoding


def test_natural_patches_statistics():
    """1/f patches: per-patch mean ≈ 0, std ≈ 1, spectrum decays."""
    x = np.asarray(natural_patches(jax.random.key(0), 64, 8))
    assert x.shape == (64, 64)
    np.testing.assert_allclose(x.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(x.std(axis=0), 1.0, atol=0.02)
    # low-frequency power dominates: DC-adjacent FFT bin beats the Nyquist
    img = x[:, 0].reshape(8, 8)
    f = np.abs(np.fft.fft2(img))
    assert f[0, 1] + f[1, 0] > f[4, 4]


def test_ista_sparsifies_and_reconstructs():
    phi = np.asarray(load_pretrained(64, 128))
    x = np.asarray(natural_patches(jax.random.key(1), 32, 8))
    a = np.asarray(ista_codes(phi, x, lam=8.0, sigma=0.316, num_iters=60))
    frac_active = float((np.abs(a) > 1e-6).mean())
    assert 0.02 < frac_active < 0.6, frac_active
    resid = x - phi @ a
    assert float((resid**2).mean()) < 0.6 * float((x**2).mean())


def test_learning_reduces_reconstruction_error():
    out = learn_dictionary(
        jax.random.key(0), num_steps=40, batch=64, ista_iters=25
    )
    err = np.asarray(out.recon_err)
    assert err[-1] < 0.8 * err[0], (err[0], err[-1])
    norms = np.linalg.norm(np.asarray(out.phi), axis=0)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_shipped_artifact_drives_default_sparse_coding():
    """The committed phi_64x128.npz is the default config-5 dictionary."""
    phi = load_pretrained(64, 128)
    assert phi is not None and phi.shape == (64, 128)
    np.testing.assert_allclose(np.linalg.norm(phi, axis=0), 1.0, atol=1e-4)

    dist = SparseCoding()  # default (64, 128) = the artifact's shape
    assert dist.uses_pretrained_phi
    np.testing.assert_array_equal(np.asarray(dist.dictionary), phi)
    # the energy runs on it end-to-end
    x = dist.init_x(jax.random.key(0), 16)
    u, g = dist.potential_and_grad(x)
    assert np.isfinite(np.asarray(u)).all() and np.isfinite(np.asarray(g)).all()

    # gabor fallback still available and different
    gab = SparseCoding(phi_source="gabor")
    assert not gab.uses_pretrained_phi
    assert not np.allclose(np.asarray(gab.dictionary), phi)
