"""Checkpoint/resume + burn-in cache tests (SURVEY.md §5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.models import Gaussian
from mjhmc_tpu.samplers import make_mj_state
from mjhmc_tpu.samplers.mjhmc import mjhmc_run
from mjhmc_tpu.utils import burned_in_init, load_pytree, save_pytree


def test_checkpoint_roundtrip(tmp_path):
    dist = Gaussian(ndims=3, log_conditioning=1.0)
    state = make_mj_state(dist, jax.random.key(0), 32)
    state, _ = mjhmc_run(dist, state, jax.random.key(1), 20, 0.5, 0.2, 5)

    path = str(tmp_path / "ckpt.npz")
    save_pytree(path, state)
    fresh = make_mj_state(dist, jax.random.key(99), 32)  # different content
    restored = load_pytree(path, fresh)

    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_deterministic_resume(tmp_path):
    """ckpt → continue == uninterrupted run, bit-for-bit."""
    dist = Gaussian(ndims=2, log_conditioning=1.0)
    s0 = make_mj_state(dist, jax.random.key(2), 16)
    k1, k2 = jax.random.key(3), jax.random.key(4)

    # uninterrupted: 10 + 10 steps
    s_mid, _ = mjhmc_run(dist, s0, k1, 10, 0.5, 0.2, 5)
    s_end, out_end = mjhmc_run(dist, s_mid, k2, 10, 0.5, 0.2, 5)

    # checkpointed at the midpoint
    path = str(tmp_path / "mid.npz")
    save_pytree(path, s_mid)
    s_resumed = load_pytree(path, make_mj_state(dist, jax.random.key(5), 16))
    s_end2, out_end2 = mjhmc_run(dist, s_resumed, k2, 10, 0.5, 0.2, 5)

    np.testing.assert_array_equal(
        np.asarray(s_end.chain.x), np.asarray(s_end2.chain.x)
    )
    np.testing.assert_array_equal(
        np.asarray(out_end["sel"]), np.asarray(out_end2["sel"])
    )


def test_checkpoint_prng_key(tmp_path):
    """Typed PRNG keys survive the npz roundtrip."""
    tree = {"k": jax.random.key(7), "x": jnp.ones((3,))}
    path = str(tmp_path / "k.npz")
    save_pytree(path, tree)
    restored = load_pytree(path, {"k": jax.random.key(0), "x": jnp.zeros((3,))})
    a = jax.random.normal(tree["k"], (4,))
    b = jax.random.normal(restored["k"], (4,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_burned_in_init_cached(tmp_path):
    dist = Gaussian(ndims=2, log_conditioning=1.0)
    cache = str(tmp_path / "cache")
    x1 = burned_in_init(dist, 32, cache_dir=cache, burn_steps=50)
    assert x1.shape == (2, 32)
    # second call hits the cache: identical content
    x2 = burned_in_init(dist, 32, cache_dir=cache, burn_steps=50)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    assert len(os.listdir(cache)) == 1
    # burned-in states roughly match the target scale
    var = np.asarray(x1).var(axis=1)
    tgt = np.asarray(dist.analytic_var())
    assert (var > 0.1 * tgt).all() and (var < 10 * tgt).all()


def test_sharded_checkpoint_roundtrip_on_mesh(tmp_path):
    """Multi-host-safe checkpoint on the 8-virtual-device mesh: per-process
    shard save + index-matched restore is bit-exact, and resuming from the
    restored carry reproduces the uninterrupted run exactly."""
    from mjhmc_tpu.parallel.mesh import make_chain_mesh, shard_chain_pytree
    from mjhmc_tpu.utils.checkpoint import (
        load_sharded_pytree,
        save_sharded_pytree,
    )

    dist = Gaussian(ndims=3, log_conditioning=1.0)
    mesh = make_chain_mesh()
    state = shard_chain_pytree(make_mj_state(dist, jax.random.key(0), 64), mesh)

    run = jax.jit(
        lambda s, k: mjhmc_run(
            dist, s, k, 10, 0.5, 0.2, 5, collect="stats"
        )[0]
    )
    seg1 = run(state, jax.random.key(1))
    prefix = str(tmp_path / "carry")
    path = save_sharded_pytree(prefix, seg1)
    assert path.endswith(".proc0of1.npz")

    example = shard_chain_pytree(make_mj_state(dist, jax.random.key(9), 64), mesh)
    restored = load_sharded_pytree(prefix, example)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(seg1)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.sharding == b.sharding  # restored onto the example's mesh

    resumed = run(restored, jax.random.key(2))
    direct = run(seg1, jax.random.key(2))
    for a, b in zip(
        jax.tree_util.tree_leaves(resumed), jax.tree_util.tree_leaves(direct)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_checkpoint_rejects_wrong_sharding(tmp_path):
    """A checkpoint saved under one sharding refuses to silently load into
    an incompatibly-sharded example (shard-index lookup fails loudly)."""
    import pytest

    from mjhmc_tpu.parallel.mesh import make_chain_mesh, shard_chain_pytree
    from mjhmc_tpu.utils.checkpoint import (
        load_sharded_pytree,
        save_sharded_pytree,
    )

    mesh = make_chain_mesh()
    x = shard_chain_pytree(jnp.arange(64, dtype=jnp.float32)[None, :], mesh)
    prefix = str(tmp_path / "x")
    save_sharded_pytree(prefix, {"x": x})
    # example with HALF the chains: no stored shard matches its indices
    bad = shard_chain_pytree(jnp.arange(32, dtype=jnp.float32)[None, :], mesh)
    with pytest.raises((KeyError, Exception)):
        load_sharded_pytree(prefix, {"x": bad})
