"""Explicit-collective paths + the collective-free hot-loop guarantee."""

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.models import RoughWell
from mjhmc_tpu.inference.smc import systematic_resample
from mjhmc_tpu.parallel.collectives import (
    distributed_systematic_resample,
    sharded_moments,
)
from mjhmc_tpu.parallel.mesh import make_chain_mesh, shard_chain_pytree
from mjhmc_tpu.samplers import make_mj_state
from mjhmc_tpu.samplers.mjhmc import mjhmc_run


def test_sharded_moments_match_dense():
    mesh = make_chain_mesh(8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 64)).astype(np.float32))
    w = jnp.asarray(rng.uniform(0.5, 2.0, 64).astype(np.float32))
    mean, var = jax.jit(lambda x, w: sharded_moments(x, w, mesh))(x, w)
    wx = np.asarray(w)
    xs = np.asarray(x)
    m_ref = (wx * xs).sum(axis=1) / wx.sum()
    v_ref = (wx * xs**2).sum(axis=1) / wx.sum() - m_ref**2
    np.testing.assert_allclose(np.asarray(mean), m_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var), v_ref, rtol=1e-4)


def test_distributed_resample_equals_global():
    """shard_map resampling == single-device systematic resampling."""
    mesh = make_chain_mesh(8)
    rng = np.random.default_rng(1)
    n = 128
    x = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    log_w = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    key = jax.random.key(5)
    x_global = systematic_resample(key, x, log_w)
    x_dist = jax.jit(
        lambda k, x, lw: distributed_systematic_resample(k, x, lw, mesh)
    )(key, x, log_w)
    np.testing.assert_allclose(
        np.asarray(x_dist), np.asarray(x_global), rtol=1e-6
    )


def test_sampler_hot_loop_is_collective_free():
    """SURVEY.md §7: the per-step sampler path must contain NO collectives
    when chains are sharded — that is what preserves ≥90% scaling. Checked
    at the compiler level: the optimized HLO of a sharded 8-device MJHMC
    run must not contain any cross-device communication ops."""
    dist = RoughWell(ndims=2)
    mesh = make_chain_mesh(8)
    st = shard_chain_pytree(make_mj_state(dist, jax.random.key(0), 128), mesh)
    fn = jax.jit(lambda s, k: mjhmc_run(dist, s, k, 5, 1.0, 0.1, 5, 1, "stats"))
    compiled = fn.lower(st, jax.random.key(1)).compile()
    hlo = compiled.as_text()
    for op in ("all-reduce", "all-gather", "collective-permute", "all-to-all",
               "reduce-scatter"):
        assert op not in hlo, f"sampler hot loop contains {op}"


def test_pt_hot_loop_is_collective_free():
    """Parallel tempering under chain sharding: the temperature ladder is a
    replicated leading axis, replica exchange is roll/where along it, and
    the chain axis is never concatenated/sliced — so the compiled step must
    contain zero cross-device ops, same guarantee as the MJHMC loop."""
    from mjhmc_tpu.models import GaussianMixture
    from mjhmc_tpu.samplers.tempering import (
        geometric_ladder,
        make_pt_state,
        pt_run,
    )

    dist = GaussianMixture()
    mesh = make_chain_mesh(8)
    st = shard_chain_pytree(
        make_pt_state(dist, jax.random.key(0), 128, 4), mesh
    )
    betas = jnp.asarray(geometric_ladder(4, 0.05))
    fn = jax.jit(
        lambda s, k: pt_run(dist, s, k, 4, betas, 0.4, 5, collect="stats")
    )
    compiled = fn.lower(st, jax.random.key(1)).compile()
    hlo = compiled.as_text()
    for op in ("all-reduce", "all-gather", "collective-permute", "all-to-all",
               "reduce-scatter"):
        assert op not in hlo, f"PT hot loop contains {op}"
    # and it actually runs sharded
    s2, out = fn(st, jax.random.key(2))
    assert np.isfinite(np.asarray(out["moments"].mean())).all()


def test_adaptive_loop_has_exactly_cross_chain_reduction():
    """The adaptive warmup DOES reduce across chains (accept-stat mean) —
    the one collective allowed in the loop (SURVEY.md §5.8)."""
    from mjhmc_tpu.samplers.adaptation import adaptive_mjhmc_run, da_init

    dist = RoughWell(ndims=2)
    mesh = make_chain_mesh(8)
    st = shard_chain_pytree(make_mj_state(dist, jax.random.key(0), 128), mesh)
    fn = jax.jit(
        lambda s, d, k: adaptive_mjhmc_run(dist, s, d, k, 5, 0.1, 5)
    )
    compiled = fn.lower(st, da_init(1.0), jax.random.key(1)).compile()
    hlo = compiled.as_text()
    assert "all-reduce" in hlo


def test_distributed_resample_exact_under_degenerate_weights():
    """Bit-exact equality with the single-device inversion even when all
    mass sits on one shard / one particle (the ring must run extra hops)."""
    mesh = make_chain_mesh(8)
    key = jax.random.key(9)
    n = 256
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((4, n)).astype(np.float32)
    )
    patterns = {
        "uniform": jnp.zeros((n,)),
        "first_shard": jnp.where(jnp.arange(n) < n // 8, 0.0, -1e30),
        "last_shard": jnp.where(jnp.arange(n) >= n - n // 8, 0.0, -1e30),
        "one_particle": jnp.where(jnp.arange(n) == 200, 0.0, -1e30),
    }
    dist = jax.jit(
        lambda k, x, lw: distributed_systematic_resample(k, x, lw, mesh)
    )
    for name, lw in patterns.items():
        ref = systematic_resample(key, x, lw)
        got = dist(key, x, lw)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(ref), err_msg=name
        )


def test_distributed_resample_moves_weights_not_states():
    """SURVEY.md §7 hard part 5: the resample must not materialize the
    global particle block on any device. The compiled HLO may all-gather
    the (n,) WEIGHT vector only — every all-gather op must be n floats,
    never the (d, n) state block — and must use collective-permute (the
    adaptive ring) for state movement."""
    mesh = make_chain_mesh(8)
    d, n = 16, 512
    x = jnp.zeros((d, n), jnp.float32)
    lw = jnp.zeros((n,), jnp.float32)
    fn = jax.jit(
        lambda k, x, lw: distributed_systematic_resample(k, x, lw, mesh)
    )
    hlo = fn.lower(jax.random.key(0), x, lw).compile().as_text()
    assert "collective-permute" in hlo
    import re

    for line in hlo.splitlines():
        if "all-gather(" not in line:
            continue
        # every all-gather output must be exactly the weight vector size
        shapes = re.findall(r"f32\[([\d,]+)\]", line)
        assert shapes, line
        numel = max(
            int(np.prod([int(v) for v in s.split(",")])) for s in shapes
        )
        assert numel <= n, f"state-sized all-gather in resample HLO: {line}"


def test_sharded_nuts_is_collective_free_and_matches_shapes():
    """NUTS under chain sharding: a naively sharded nuts_run reduces
    ``done`` over the sharded chain axis in its while conditions (one
    all-reduce per doubling round); ``sharded_nuts_run`` gives each shard
    its own while loops instead — the compiled HLO must contain zero
    cross-device communication, and the run must produce the full
    (steps, ...) output block with sane per-chain counters."""
    from mjhmc_tpu.models import Gaussian
    from mjhmc_tpu.samplers.nuts import make_nuts_state, sharded_nuts_run

    dist = Gaussian(ndims=2, log_conditioning=1.0)
    mesh = make_chain_mesh(8)
    n, steps, max_depth = 128, 4, 4
    st = shard_chain_pytree(
        make_nuts_state(dist, jax.random.key(0), n), mesh
    )
    fn = jax.jit(
        lambda s, : sharded_nuts_run(
            mesh, dist, s, jax.random.key(1), steps, 0.5, max_depth
        )
    )
    compiled = fn.lower(st).compile()
    hlo = compiled.as_text()
    for op in ("all-reduce", "all-gather", "collective-permute", "all-to-all",
               "reduce-scatter"):
        assert op not in hlo, f"sharded NUTS contains {op}"

    out_state, outs = fn(st)
    assert outs["x"].shape == (steps, 2, n)
    assert outs["depth"].shape == (steps, n)
    ev = np.asarray(out_state.grad_evals)
    assert ev.min() >= steps  # ≥ 1 leaf per iteration per chain
    assert ev.max() <= steps * (2**max_depth - 1)
    assert outs["evals_mean_shards"].shape == (steps, 8)
