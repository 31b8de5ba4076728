"""Sparse-coding posterior — the large-state benchmark.

Reference behavior (SURVEY.md §2.2d): energy over coefficients ``a`` of
natural-image patches under a pre-trained dictionary Φ,

    U(a) = λ · Σᵢ smooth_l1(aᵢ)  +  ½σ⁻² ‖x − Φa‖²

originally Theano-compiled, with Φ shipped as a data file. The reference's
data file is unavailable (reference mount empty — SURVEY.md provenance
notice), so Φ here is PRETRAINED on-device over 1/f natural-statistics
patches (models/dictionary_learning.py — Olshausen-Field sparse coding)
and shipped as the package data artifact ``mjhmc_tpu/data/phi_<p>x<b>.npz``
— the faithful analogue of the reference's "pre-trained dictionary shipped
as a data file". For shapes with no shipped artifact, Φ falls back to a
deterministic synthetic Gabor bank (``phi_source="gabor"`` forces it).

The Φa contraction is a single (npixels × nbasis) matmul on the MXU; at
pod scale the basis axis may be sharded over a ``model`` mesh axis with a
psum of partial residuals (SURVEY.md §5 long-context analogue) — see
``parallel.mesh``.

BASELINE config 5 runs this chain-sharded with SMC resampling.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.models.base import Distribution, register

Array = jax.Array


def _gabor_dictionary(npixels: int, nbasis: int, seed: int) -> np.ndarray:
    """Deterministic Gabor-like dictionary, columns unit-norm.

    (side × side) patches; parameters drawn from a seeded host RNG.
    """
    side = int(round(np.sqrt(npixels)))
    assert side * side == npixels, "npixels must be a perfect square"
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:side, 0:side].astype(np.float64)
    phis = np.empty((npixels, nbasis))
    for j in range(nbasis):
        theta = rng.uniform(0, np.pi)
        freq = rng.uniform(0.5, 2.0) / side * 2 * np.pi
        phase = rng.uniform(0, 2 * np.pi)
        cx, cy = rng.uniform(0, side, 2)
        sigma = rng.uniform(0.15, 0.35) * side
        xr = (xx - cx) * np.cos(theta) + (yy - cy) * np.sin(theta)
        env = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sigma**2))
        g = env * np.cos(freq * xr + phase)
        g -= g.mean()
        n = np.linalg.norm(g)
        phis[:, j] = (g / (n if n > 1e-9 else 1.0)).ravel()
    return phis.astype(np.float32)


@register("sparse_coding")
@dataclasses.dataclass(frozen=True)
class SparseCoding(Distribution):
    """Posterior over sparse codes ``a`` given patches ``x`` (one per chain).

    Chain state dimensionality = ``nbasis``. Each chain can carry its own
    conditioning patch (set via ``with_patches``); by default all chains
    share one synthetic patch so the object is usable standalone.
    """

    npixels: int = 64
    nbasis: int = 128
    lam: float = 1.0  # sparsity weight λ
    sigma: float = 0.1  # observation noise σ
    smooth_eps: float = 1e-3  # smooth-L1 knee
    dict_seed: int = 0
    patch_seed: int = 1
    #: "auto": shipped pretrained artifact if one matches (npixels, nbasis),
    #: else Gabor; "pretrained": require the artifact; "gabor": force the
    #: synthetic bank. NOTE: burn-in init caches key on the dataclass hash —
    #: regenerating the artifact invalidates results, not the cache key.
    phi_source: str = "auto"

    @property
    def ndims(self) -> int:  # type: ignore[override]
        return self.nbasis

    @functools.cached_property
    def _phi(self) -> np.ndarray:
        if self.phi_source in ("auto", "pretrained"):
            from mjhmc_tpu.models.dictionary_learning import load_pretrained

            phi = load_pretrained(self.npixels, self.nbasis)
            if phi is not None:
                return phi
            if self.phi_source == "pretrained":
                raise FileNotFoundError(
                    f"no pretrained dictionary for ({self.npixels}, "
                    f"{self.nbasis}); run python -m "
                    "mjhmc_tpu.models.dictionary_learning"
                )
        return _gabor_dictionary(self.npixels, self.nbasis, self.dict_seed)

    @property
    def uses_pretrained_phi(self) -> bool:
        from mjhmc_tpu.models.dictionary_learning import load_pretrained

        return self.phi_source in ("auto", "pretrained") and (
            load_pretrained(self.npixels, self.nbasis) is not None
        )

    @property
    def dictionary(self) -> Array:
        """Φ: (npixels, nbasis)."""
        return jnp.asarray(self._phi)

    @functools.cached_property
    def _patch(self) -> np.ndarray:
        """Conditioning patch. With a pretrained Φ: a held-out patch from
        the same 1/f natural-statistics ensemble Φ was trained on (the
        reference conditioned on natural-image patches). With the Gabor
        fallback: a patch generated from the model itself (x = Φa₀ + ε)."""
        rng = np.random.default_rng(self.patch_seed)
        if self.uses_pretrained_phi:
            side = int(round(np.sqrt(self.npixels)))
            fx = np.fft.fftfreq(side)
            rad = np.sqrt(fx[:, None] ** 2 + fx[None, :] ** 2)
            amp = np.where(rad > 0, 1.0 / np.maximum(rad, 1e-6), 0.0)
            noise = rng.standard_normal((side, side)) + 1j * rng.standard_normal(
                (side, side)
            )
            img = np.real(np.fft.ifft2(noise * amp))
            img = (img - img.mean()) / (img.std() + 1e-8)
            return img.ravel().astype(np.float32)
        a0 = rng.laplace(scale=0.5, size=self.nbasis)
        a0 *= rng.random(self.nbasis) < 0.1  # sparse support
        x = self._phi @ a0 + self.sigma * rng.standard_normal(self.npixels)
        return x.astype(np.float32)

    #: optional user-supplied patch overriding the synthetic one
    custom_patch: tuple | None = None

    @property
    def patch(self) -> Array:
        if self.custom_patch is not None:
            p = np.asarray(self.custom_patch, np.float32)
            assert p.shape == (self.npixels,)
            return jnp.asarray(p)[:, None]
        return jnp.asarray(self._patch)[:, None]  # (npixels, 1) broadcast

    @classmethod
    def with_patch(cls, patch, **kwargs) -> "SparseCoding":
        """Condition on a user image patch (flattened, length npixels) —
        the reference shipped natural-image patches as data files
        (SURVEY.md §2.2d); pass them here."""
        patch = np.asarray(patch, np.float32).ravel()
        return cls(npixels=len(patch), custom_patch=tuple(patch.tolist()), **kwargs)

    # ---------------------------------------------------------------- energy
    def _smooth_l1(self, a: Array) -> Array:
        return jnp.sqrt(a * a + self.smooth_eps)

    def potential(self, a: Array) -> Array:
        phi = self.dictionary
        recon = jnp.einsum("pb,...bn->...pn", phi, a, preferred_element_type=jnp.float32)
        resid = self.patch - recon
        sparse = self.lam * jnp.sum(self._smooth_l1(a), axis=-2)
        fit = 0.5 / (self.sigma**2) * jnp.sum(resid * resid, axis=-2)
        return sparse + fit

    def potential_and_grad(self, a: Array):
        phi = self.dictionary
        recon = jnp.einsum("pb,...bn->...pn", phi, a, preferred_element_type=jnp.float32)
        resid = self.patch - recon
        s = jnp.sqrt(a * a + self.smooth_eps)
        u = self.lam * jnp.sum(s, axis=-2) + 0.5 / (self.sigma**2) * jnp.sum(
            resid * resid, axis=-2
        )
        g = self.lam * (a / s) - (1.0 / self.sigma**2) * jnp.einsum(
            "pb,...pn->...bn", phi, resid, preferred_element_type=jnp.float32
        )
        return u, g

    def init_x(self, key: Array, nbatch: int) -> Array:
        return 0.1 * jax.random.normal(key, (self.nbasis, nbatch), jnp.float32)
