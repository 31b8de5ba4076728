"""Explicit collective implementations for the chain-sharded runtime.

Most cross-chain reductions in this framework are written as plain
``jnp.mean``/``jnp.sum`` under ``jit`` and GSPMD lowers them to psums.
This module provides the *explicit* ``shard_map`` counterparts specified
in SURVEY.md §5.8 — useful when collective placement must be controlled
(and as executable documentation of the communication pattern):

- ``sharded_moments``: psum of dwell-weighted sufficient statistics;
- ``distributed_systematic_resample``: all_gather of the (small) weight
  vector, global prefix-sum inversion, then an adaptive ppermute ring that
  moves PARTICLE BLOCKS only as far as ancestors actually travel — weights
  travel globally (n floats), states move the minimum number of ring hops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
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
    """Systematic resampling across shards WITHOUT materializing the global
    particle block on any device (SURVEY.md §5.8, §7 hard part 5).

    Protocol:

    1. all_gather the log-WEIGHTS only (n floats — tiny next to n·d
       states); every shard computes the identical global CDF, the shared
       u₀ (same key), and the global ancestor index for each of ITS OWN
       output slots — exactly the single-device inversion restricted to
       one shard's slots, so results match
       ``inference.smc.systematic_resample`` bit-for-bit.
    2. an adaptive ppermute RING over the (d, n/P) particle blocks: at hop
       r every shard holds shard (me+r) mod P's block and copies whichever
       of its still-missing ancestors live there; a psum'd remaining-count
       ends the ``while_loop`` as soon as every shard is satisfied.

    Per-device memory is O(n·d/P + n) — never the O(n·d) of a full-state
    all_gather. Data moved adapts to how far ancestors actually travel:
    near-uniform weights (the common case — SMC resamples right after
    adaptive tempering pinned ESS at ~½n, so mass is spread) finish in
    1-2 hops; the ring only runs all P hops in the fully-degenerate case,
    where O(n·d) movement is unavoidable because one shard's survivors
    must populate every other shard. The compiled program contains NO
    state-sized all-gather (tests/test_collectives.py pins this on HLO).
    """
    n = log_w.shape[0]
    num_shards = mesh.shape["chains"]

    def local(k, x_s, lw_s):
        lw = lax.all_gather(lw_s, "chains", tiled=True)  # (n,) weights only
        lw = lw - jax.scipy.special.logsumexp(lw)
        cdf = jnp.cumsum(jnp.exp(lw))
        u0 = jax.random.uniform(k, (), jnp.float32, 0.0, 1.0 / n)

        me = lax.axis_index("chains").astype(jnp.int32)
        n_local = x_s.shape[1]
        slots = me * n_local + jnp.arange(n_local)
        pos = u0 + slots.astype(jnp.float32) / n
        anc = jnp.clip(jnp.searchsorted(cdf, pos), 0, n - 1)
        src_shard = (anc // n_local).astype(jnp.int32)
        local_idx = anc - src_shard * n_local

        ring = [((i + 1) % num_shards, i) for i in range(num_shards)]

        def body(c):
            r, buf, out, remaining, _ = c
            src = lax.rem(me + r, jnp.int32(num_shards))
            take = remaining & (src_shard == src)
            vals = jnp.take(buf, local_idx, axis=1)  # local gather
            out = jnp.where(take[None, :], vals, out)
            remaining = remaining & ~take
            glob = lax.psum(jnp.sum(remaining.astype(jnp.int32)), "chains")
            buf = lax.ppermute(buf, "chains", ring)
            return (r + 1, buf, out, remaining, glob)

        def cond(c):
            r, _, _, _, glob = c
            return (r < num_shards) & (glob > 0)

        # fresh arrays must be marked device-varying for the while carry
        # (their loop-updated values depend on axis_index)
        remaining0 = lax.pcast(
            jnp.ones((n_local,), bool), ("chains",), to="varying"
        )
        init = (
            jnp.int32(0), x_s, jnp.zeros_like(x_s), remaining0, jnp.int32(n)
        )
        _, _, out, _, _ = lax.while_loop(cond, body, init)
        return out

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, "chains"), P("chains")),
        out_specs=P(None, "chains"),
    )(key, x, log_w)
