"""Chain-sharded runtime tests on the forced 8-device CPU mesh
(SURVEY.md §4.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjhmc_tpu.models import Gaussian, RoughWell
from mjhmc_tpu.parallel.mesh import (
    chain_sharding,
    make_chain_mesh,
    shard_chain_pytree,
)
from mjhmc_tpu.samplers import make_mj_state
from mjhmc_tpu.samplers.mjhmc import mjhmc_run
from mjhmc_tpu.samplers.adaptation import adaptive_mjhmc_run, da_init


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_mesh_and_shardings():
    mesh = make_chain_mesh(8)
    assert mesh.shape == {"chains": 8}
    s2 = chain_sharding(mesh, 2)
    s1 = chain_sharding(mesh, 1)
    x = jax.device_put(jnp.zeros((4, 64)), s2)
    w = jax.device_put(jnp.zeros((64,)), s1)
    assert len(x.sharding.device_set) == 8
    assert len(w.sharding.device_set) == 8


def test_sharded_state_pytree():
    dist = Gaussian(ndims=4, log_conditioning=1.0)
    mesh = make_chain_mesh(8)
    st = make_mj_state(dist, jax.random.key(0), 128)
    st_sharded = shard_chain_pytree(st, mesh)
    assert len(st_sharded.chain.x.sharding.device_set) == 8
    assert len(st_sharded.h_back.sharding.device_set) == 8


def test_sharded_run_matches_unsharded():
    """Same keys ⇒ sharded and single-device runs agree numerically."""
    dist = RoughWell(ndims=2)
    st = make_mj_state(dist, jax.random.key(1), 64)
    key = jax.random.key(2)

    _, out_ref = jax.jit(
        lambda s, k: mjhmc_run(dist, s, k, 30, 1.0, 0.2, 5)
    )(st, key)

    mesh = make_chain_mesh(8)
    st_sh = shard_chain_pytree(st, mesh)
    _, out_sh = jax.jit(
        lambda s, k: mjhmc_run(dist, s, k, 30, 1.0, 0.2, 5)
    )(st_sh, key)

    np.testing.assert_allclose(
        np.asarray(out_ref["x"]), np.asarray(out_sh["x"]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out_ref["sel"]), np.asarray(out_sh["sel"])
    )


def test_sharded_adaptive_training_step():
    """The full multi-chip training step (jump + psum'd accept mean + DA)
    compiles and runs with the chain axis sharded."""
    dist = RoughWell(ndims=2)
    mesh = make_chain_mesh(8)
    st = shard_chain_pytree(make_mj_state(dist, jax.random.key(3), 128), mesh)
    da = da_init(1.0)
    run = jax.jit(lambda s, d, k: adaptive_mjhmc_run(dist, s, d, k, 5, 0.1, 5))
    st, da, aux = run(st, da, jax.random.key(4))
    assert int(da.step) == 5
    assert np.isfinite(np.asarray(aux["eps_trace"])).all()
    # dwell mass accumulated on every chain
    assert (np.asarray(aux["moments"].w) > 0).all()
