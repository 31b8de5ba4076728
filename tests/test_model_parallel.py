"""Model-axis (tensor-parallel analogue) sharding tests for the
sparse-coding energy (SURVEY.md §5) on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.models import SparseCoding
from mjhmc_tpu.parallel.mesh import make_chain_mesh
from mjhmc_tpu.parallel.model_parallel import (
    ModelShardedSparseCoding,
    model_sharded_potential_and_grad,
)
from mjhmc_tpu.samplers import make_mj_state
from mjhmc_tpu.samplers.mjhmc import mjhmc_run


def test_sharded_energy_matches_dense():
    dist = SparseCoding(npixels=64, nbasis=128)
    mesh = make_chain_mesh(8, model_axis=4)  # chains=2 × model=4
    pg = model_sharded_potential_and_grad(dist, mesh)

    a = dist.init_x(jax.random.key(0), 16)
    u_ref, g_ref = dist.potential_and_grad(a)
    u_sh, g_sh = jax.jit(pg)(a)

    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(g_sh), np.asarray(g_ref), rtol=2e-3, atol=2e-3
    )


def test_mjhmc_on_model_sharded_energy():
    """Full MJHMC run with the basis contraction sharded over the model
    axis and chains over the chain axis — the BASELINE config-5 layout."""
    base = SparseCoding(npixels=64, nbasis=128)
    mesh = make_chain_mesh(8, model_axis=2)  # chains=4 × model=2
    dist = ModelShardedSparseCoding(base, mesh)

    state = make_mj_state(dist, jax.random.key(1), 32)
    run = jax.jit(lambda s, k: mjhmc_run(dist, s, k, 10, 0.02, 0.1, 3))
    state, out = run(state, jax.random.key(2))

    assert np.isfinite(np.asarray(out["x"])).all()
    assert np.isfinite(np.asarray(out["dwell"])).all()
    assert np.asarray(out["cache_err"]).max() < 5e-2  # fp32, large energies

    # statistically the same sampler: dense run on identical keys
    state_d = make_mj_state(base, jax.random.key(1), 32)
    run_d = jax.jit(lambda s, k: mjhmc_run(base, s, k, 10, 0.02, 0.1, 3))
    state_d, out_d = run_d(state_d, jax.random.key(2))
    np.testing.assert_allclose(
        np.asarray(out["x"]), np.asarray(out_d["x"]), rtol=1e-3, atol=1e-3
    )
