"""ADVI head over the shared differentiable log-density API.

Required by the north star as an *addition* to the reference capability set
(SURVEY.md §2.9): mean-field Gaussian variational inference with
reparameterized gradients, optimized with optax, over any registered
``Distribution``'s ``logdensity``.

TPU shape discipline matches the samplers: Monte-Carlo samples ride the
lane axis — draws are (ndims, n_mc) — so one ELBO evaluation is the same
fused energy kernel the samplers use.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from mjhmc_tpu.models.base import Distribution

Array = jax.Array


class ADVIParams(NamedTuple):
    mu: Array  # (ndims,)
    omega: Array  # (ndims,) log standard deviations


def advi_init(dist: Distribution, init_scale: float = 0.1) -> ADVIParams:
    d = dist.ndims
    return ADVIParams(
        mu=jnp.zeros((d,), jnp.float32),
        omega=jnp.full((d,), jnp.log(init_scale), jnp.float32),
    )


def sample_q(params: ADVIParams, key: Array, n: int) -> Array:
    """Draw n samples from q = N(μ, diag(e^{2ω})), shape (ndims, n)."""
    xi = jax.random.normal(key, (params.mu.shape[0], n), jnp.float32)
    return params.mu[:, None] + jnp.exp(params.omega)[:, None] * xi


def elbo(dist: Distribution, params: ADVIParams, key: Array, n_mc: int) -> Array:
    """Reparameterized ELBO estimate: E_q[log p] + H(q)."""
    z = sample_q(params, key, n_mc)
    entropy = jnp.sum(params.omega) + 0.5 * params.mu.shape[0] * jnp.log(
        2.0 * jnp.pi * jnp.e
    )
    return jnp.mean(dist.logdensity(z)) + entropy


def advi_fit(
    dist: Distribution,
    key: Array,
    num_steps: int = 2000,
    n_mc: int = 64,
    learning_rate: float = 0.05,
    init_scale: float = 0.1,
) -> Tuple[ADVIParams, Array]:
    """Run ADVI; returns (params, elbo_trace).

    The whole optimization is one ``lax.scan`` under jit — no host round
    trips (the TPU-native analogue of a Python training loop).
    """
    params = advi_init(dist, init_scale)
    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    loss = lambda p, k: -elbo(dist, p, k, n_mc)
    keys = jax.random.split(key, num_steps)

    def step(carry, k):
        p, s = carry
        val, g = jax.value_and_grad(loss)(p, k)
        updates, s = opt.update(g, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), -val

    (params, _), elbos = jax.lax.scan(step, (params, opt_state), keys)
    return params, elbos


@dataclasses.dataclass
class ADVI:
    """Convenience wrapper mirroring the sampler class API."""

    distribution: Distribution
    num_steps: int = 2000
    n_mc: int = 64
    learning_rate: float = 0.05
    seed: int = 0

    def fit(self) -> Tuple[ADVIParams, Array]:
        key = jax.random.key(self.seed)
        fit = jax.jit(
            lambda k: advi_fit(
                self.distribution,
                k,
                self.num_steps,
                self.n_mc,
                self.learning_rate,
            )
        )
        self.params, self.elbo_trace = fit(key)
        return self.params, self.elbo_trace

    def sample(self, n: int, seed: int = 1) -> Array:
        return sample_q(self.params, jax.random.key(seed), n)
