"""Model-axis sharding of the sparse-coding energy (SURVEY.md §5).

The one place the reference capability set has a "big" per-chain state is
the sparse-coding posterior: U(a) = λ·Σ smooth_l1(a) + ½σ⁻²‖x − Φa‖².
When Φ (npixels × nbasis) outgrows one chip, the basis axis shards over a
``model`` mesh axis — the direct analogue of tensor parallelism:

- each shard holds a column block Φ_s and the matching coefficient rows
  a_s; partial products Φ_s a_s are **psum-reduced over the model axis**
  to form the shared residual (one collective per energy eval);
- the fit gradient −σ⁻² Φ_sᵀ r and the sparsity term are then purely
  local to each shard.

Implemented with ``shard_map`` so the collective placement is explicit and
testable; plain ``jit`` + NamedSharding annotations produce the same
program via GSPMD (both paths are tested for equality against the dense
computation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mjhmc_tpu.models.sparse_coding import SparseCoding

Array = jax.Array


def model_sharded_potential_and_grad(dist: SparseCoding, mesh: Mesh):
    """Returns pg(a) = (U, dU/da) with a sharded P('model', 'chains').

    ``a``: (nbasis, nbatch) with basis rows on the model axis and chains on
    the chains axis; U replicated over model; gradient sharded like ``a``.
    """
    phi = dist.dictionary  # (npixels, nbasis)
    patch = dist.patch  # (npixels, 1)
    inv_sig2 = 1.0 / (dist.sigma**2)
    lam, seps = dist.lam, dist.smooth_eps

    def local_pg(phi_s: Array, patch_r: Array, a_s: Array):
        # partial reconstruction, reduced across basis shards; a_s may carry
        # leading batch axes (rank-polymorphic energy contract, models.base)
        recon = jnp.einsum(
            "pb,...bn->...pn", phi_s, a_s, preferred_element_type=jnp.float32
        )
        recon = jax.lax.psum(recon, "model")
        resid = patch_r - recon  # replicated over model
        s = jnp.sqrt(a_s * a_s + seps)
        u_local = lam * jnp.sum(s, axis=-2)  # shard's sparsity share
        u_sparse = jax.lax.psum(u_local, "model")
        u_fit = 0.5 * inv_sig2 * jnp.sum(resid * resid, axis=-2)
        u = u_sparse + u_fit
        g_s = lam * (a_s / s) - inv_sig2 * jnp.einsum(
            "pb,...pn->...bn", phi_s, resid, preferred_element_type=jnp.float32
        )
        return u, g_s

    def _pg_for_rank(lead: int):
        lead_spec = (None,) * lead
        return jax.shard_map(
            local_pg,
            mesh=mesh,
            in_specs=(
                P(None, "model"),
                P(None, None),
                P(*lead_spec, "model", "chains"),
            ),
            out_specs=(P(*lead_spec, "chains"), P(*lead_spec, "model", "chains")),
        )

    cache: dict = {}

    def potential_and_grad(a: Array):
        lead = a.ndim - 2
        if lead not in cache:
            cache[lead] = _pg_for_rank(lead)
        return cache[lead](phi, patch, a)

    return potential_and_grad


class ModelShardedSparseCoding:
    """Distribution adapter: SparseCoding with the basis axis sharded.

    Drop-in for the samplers on a ('chains', 'model') mesh: same
    ``potential_and_grad`` contract, state arrays placed with
    P('model', 'chains').
    """

    def __init__(self, dist: SparseCoding, mesh: Mesh):
        self._dist = dist
        self._mesh = mesh
        self._pg = model_sharded_potential_and_grad(dist, mesh)
        self.ndims = dist.ndims
        self.name = dist.name + "_model_sharded"

    def potential_and_grad(self, a: Array):
        return self._pg(a)

    def potential(self, a: Array):
        return self._pg(a)[0]

    def logdensity(self, a: Array):
        return -self.potential(a)

    def init_x(self, key: Array, nbatch: int) -> Array:
        x = self._dist.init_x(key, nbatch)
        return jax.device_put(
            x, NamedSharding(self._mesh, P("model", "chains"))
        )

    def stable_hash(self) -> str:
        return self._dist.stable_hash() + "_msharded"
