"""ChEES-SMC (arXiv:2504.02627): ChEES-adapted mutation kernels inside
the tempered SMC run."""

import jax
import numpy as np

from mjhmc_tpu.inference.smc import smc_run
from mjhmc_tpu.models import Gaussian


def test_chees_smc_gaussian():
    dist = Gaussian(ndims=4, log_conditioning=1.0)
    prior_scale = 3.0
    state, trace = jax.jit(
        lambda k: smc_run(
            dist, k, num_particles=4096, num_stages=16,
            prior_scale=prior_scale, num_mutation_steps=5,
            num_leapfrog_steps=24, mutation="chees", init_tau=0.3,
        )
    )(jax.random.key(0))
    assert float(state.lam) == 1.0

    var = np.asarray(dist.analytic_var(), np.float64)
    log_z_exact = 0.5 * np.sum(np.log(var)) - 0.5 * len(var) * np.log(prior_scale**2)
    assert abs(float(state.log_z) - log_z_exact) < 0.2

    x = np.asarray(state.x)
    np.testing.assert_allclose(x.var(axis=1), var, rtol=0.15)

    # ChEES actually adapted τ (moved from init and stayed finite/sane)
    tau = float(np.exp(np.asarray(state.log_tau)))
    assert 1e-3 < tau < 1e4 and abs(tau - 0.3) > 1e-3
