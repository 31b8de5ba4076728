"""Split-R̂ diagnostic tests (diagnostics/rhat.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjhmc_tpu.diagnostics import potential_scale_reduction


def test_converged_iid_chains_give_one():
    """Stationary iid chains → R̂ ≈ 1 in every dimension."""
    x = jax.random.normal(jax.random.key(0), (400, 3, 64))
    r = np.asarray(potential_scale_reduction(x))
    assert r.shape == (3,)
    np.testing.assert_allclose(r, 1.0, atol=0.02)


def test_disagreeing_chains_flagged():
    """Half the chains offset by 5σ → R̂ far above 1."""
    x = jax.random.normal(jax.random.key(1), (400, 2, 64))
    shift = jnp.where(jnp.arange(64) < 32, 5.0, 0.0)
    x = x + shift[None, None, :]
    r = np.asarray(potential_scale_reduction(x))
    assert (r > 2.0).all(), r


def test_trending_chain_caught_by_split():
    """A within-chain trend (burn-in remnant) inflates split-R̂ even when
    all chains share the same trend — the point of splitting."""
    t = 400
    trend = jnp.linspace(-3.0, 3.0, t)[:, None, None]
    x = 0.3 * jax.random.normal(jax.random.key(2), (t, 1, 64)) + trend
    r = np.asarray(potential_scale_reduction(x))
    assert r[0] > 1.5, r


def test_uniform_weights_match_unweighted():
    x = jax.random.normal(jax.random.key(3), (200, 2, 32))
    w = jnp.full((200, 32), 0.7)
    r_u = np.asarray(potential_scale_reduction(x))
    r_w = np.asarray(potential_scale_reduction(x, w))
    np.testing.assert_allclose(r_u, r_w, rtol=1e-5)


def test_weighted_rhat_uses_dwell_mass():
    """Chains that disagree only where the dwell weight vanishes → R̂ ≈ 1
    under the weighted diagnostic but ≫1 unweighted."""
    key = jax.random.key(4)
    x = jax.random.normal(key, (300, 1, 32))
    # inject disagreement into the first 150 steps of half the chains...
    bad = jnp.where(jnp.arange(32) < 16, 8.0, 0.0)
    mask_t = (jnp.arange(300) < 150).astype(jnp.float32)
    x = x + (mask_t[:, None, None] * bad[None, None, :])
    # ...and give those steps ~zero dwell weight
    w = jnp.where(mask_t[:, None] > 0, 1e-6, 1.0) * jnp.ones((300, 32))
    r_w = float(potential_scale_reduction(x, w)[0])
    r_u = float(potential_scale_reduction(x)[0])
    assert r_w < 1.1, r_w
    assert r_u > 1.5, r_u


def test_too_short_raises():
    x = jnp.zeros((3, 1, 8))
    with pytest.raises(ValueError):
        potential_scale_reduction(x)


def test_sharded_rhat_runs_under_jit_mesh():
    """R̂ over a chain-sharded batch compiles and matches the local value."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mjhmc_tpu.parallel.mesh import make_chain_mesh

    mesh = make_chain_mesh(8)
    x = jax.random.normal(jax.random.key(5), (100, 2, 64))
    xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "chains")))
    r_local = np.asarray(potential_scale_reduction(x))
    r_shard = np.asarray(jax.jit(potential_scale_reduction)(xs))
    np.testing.assert_allclose(r_local, r_shard, rtol=1e-5)
