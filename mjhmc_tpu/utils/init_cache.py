"""Shared burned-in initial states, cached to disk.

TPU-native version of the reference's ``gen_mj_init`` (SURVEY.md §2.6):
all samplers for a given distribution start from the same burned-in chain
states so comparisons are fair. States are generated once with a long
control-HMC burn-in and cached as ``.npz`` keyed by the distribution's
stable hash + batch size.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.models.base import Distribution

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "mjhmc_tpu", "init"
)


def burned_in_init(
    dist: Distribution,
    nbatch: int,
    cache_dir: str = DEFAULT_CACHE_DIR,
    burn_steps: int = 1000,
    epsilon: float | None = None,
    seed: int = 1234,
    refresh: bool = False,
) -> jax.Array:
    """Return (ndims, nbatch) burned-in positions, generating+caching once."""
    key = f"{dist.stable_hash()}_n{nbatch}_b{burn_steps}_s{seed}"
    path = os.path.join(cache_dir, key + ".npz")
    if not refresh and os.path.exists(path):
        return jnp.asarray(np.load(path)["x"])

    from mjhmc_tpu.samplers import make_hmc_state
    from mjhmc_tpu.samplers.adaptation import adaptive_hmc_run, da_init

    state = make_hmc_state(dist, jax.random.key(seed), nbatch)
    da = da_init(epsilon if epsilon is not None else 0.5)
    run = jax.jit(
        lambda s, d, k: adaptive_hmc_run(
            dist, s, d, k, burn_steps, 1.0, 10, 0.8
        )
    )
    state, da, _ = run(state, da, jax.random.key(seed + 1))
    x = np.asarray(state.chain.x)
    os.makedirs(cache_dir, exist_ok=True)
    np.savez(path, x=x)
    return jnp.asarray(x)
