"""Explicit collective implementations for the chain-sharded runtime.

Most cross-chain reductions in this framework are written as plain
``jnp.mean``/``jnp.sum`` under ``jit`` and GSPMD lowers them to psums.
This module provides the *explicit* ``shard_map`` counterparts specified
in SURVEY.md §5.8 — useful when collective placement must be controlled
(and as executable documentation of the communication pattern):

- ``sharded_moments``: psum of dwell-weighted sufficient statistics;
- ``distributed_systematic_resample``: all_gather of the (small) weight
  vector, global prefix-sum inversion, then each shard gathers its own
  ancestor slice — weights travel, states move once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array


def sharded_moments(x: Array, w: Array, mesh: Mesh):
    """Dwell-weighted (mean, var) over ALL chains of a sharded batch.

    x: (d, n) sharded P(None, 'chains'); w: (n,) sharded P('chains').
    Returns replicated (d,) mean and var. One psum of (2d+1) scalars.
    """

    def local(x_s, w_s):
        sw = jax.lax.psum(jnp.sum(w_s), "chains")
        swx = jax.lax.psum(jnp.sum(w_s * x_s, axis=1), "chains")
        swx2 = jax.lax.psum(jnp.sum(w_s * x_s * x_s, axis=1), "chains")
        mean = swx / sw
        return mean, swx2 / sw - mean * mean

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, "chains"), P("chains")),
        out_specs=(P(), P()),
    )(x, w)


def distributed_systematic_resample(
    key: Array, x: Array, log_w: Array, mesh: Mesh
) -> Array:
    """Systematic resampling across shards (SURVEY.md §5.8).

    Weights are all_gathered (n floats — tiny); every shard computes the
    identical global CDF and its own slot positions, then gathers its
    ancestors from the all_gathered particle block. The u₀ offset is
    shared (same key on every shard), so the result equals the
    single-device ``inference.smc.systematic_resample`` exactly.
    """
    n = log_w.shape[0]

    def local(k, x_s, lw_s):
        lw = jax.lax.all_gather(lw_s, "chains", tiled=True)  # (n,)
        lw = lw - jax.scipy.special.logsumexp(lw)
        cdf = jnp.cumsum(jnp.exp(lw))
        u0 = jax.random.uniform(k, (), jnp.float32, 0.0, 1.0 / n)

        shard = jax.lax.axis_index("chains")
        n_local = x_s.shape[1]
        slots = shard * n_local + jnp.arange(n_local)
        pos = u0 + slots.astype(jnp.float32) / n
        anc = jnp.clip(jnp.searchsorted(cdf, pos), 0, n - 1)

        x_all = jax.lax.all_gather(x_s, "chains", axis=1, tiled=True)  # (d, n)
        return x_all[:, anc]

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, "chains"), P("chains")),
        out_specs=P(None, "chains"),
    )(key, x, log_w)
