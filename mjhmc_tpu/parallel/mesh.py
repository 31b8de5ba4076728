"""Device mesh + shardings for the chain-parallel runtime.

The reference has no distributed anything (SURVEY.md §2: single NumPy
process); its one parallel primitive — a vectorized batch of independent
chains — maps to a 1-D ``('chains',)`` mesh with the batch axis of every
state array sharded over it. GSPMD/XLA inserts collectives automatically
under ``jit``; cross-chain reductions (moments, eval counters, adaptation
statistics, SMC resampling) are the only collective users, keeping the
per-step sampler path collective-free (SURVEY.md §5.8, §7 design stance —
this is what preserves ≥90% scaling efficiency).

An optional second ``('model',)`` axis shards the sparse-coding dictionary
contraction (tensor-parallel analogue, SURVEY.md §5 "long-context" note).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def make_chain_mesh(
    n_devices: Optional[int] = None, model_axis: int = 1
) -> Mesh:
    """1-D ('chains',) mesh — or ('chains','model') when model_axis > 1."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if model_axis > 1:
        assert n % model_axis == 0
        return jax.make_mesh((n // model_axis, model_axis), ("chains", "model"))
    return jax.make_mesh((n,), ("chains",))


def chain_sharding(mesh: Mesh, ndim_array: int = 2) -> NamedSharding:
    """Sharding for a state array with chains on the LAST axis.

    (ndims, nbatch) → P(None, 'chains'); (nbatch,) → P('chains').
    """
    if ndim_array == 1:
        return NamedSharding(mesh, P("chains"))
    spec = [None] * (ndim_array - 1) + ["chains"]
    return NamedSharding(mesh, P(*spec))


def shard_chain_pytree(tree, mesh: Mesh):
    """Apply chain sharding to every array in a sampler-state pytree.

    Arrays whose last axis is the chain axis (size divisible by the mesh)
    get P(..., 'chains'); anything else is replicated.
    """
    n_shards = mesh.shape["chains"]

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[-1] % n_shards == 0 and x.shape[-1] >= n_shards:
            return jax.device_put(x, chain_sharding(mesh, x.ndim))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, tree)
