"""ADVI head over the shared differentiable log-density API.

Required by the north star as an *addition* to the reference capability set
(SURVEY.md §2.9): Gaussian variational inference with reparameterized
gradients, optimized with optax, over any registered ``Distribution``'s
``logdensity``. Two families:

- mean-field: q = N(μ, diag(e^{2ω}))  (``rank=0``, default);
- low-rank-plus-diagonal: q = N(μ, D² + BBᵀ) with D = diag(e^ω) and
  B (ndims × rank) — set ``rank=ndims`` for a full-rank covariance. The
  entropy uses the matrix determinant lemma, so cost stays
  O(ndims·rank² + rank³) — MXU-friendly, no d×d factorization.

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


class LowRankADVIParams(NamedTuple):
    mu: Array  # (ndims,)
    omega: Array  # (ndims,) log diagonal stddevs
    b: Array  # (ndims, rank) low-rank covariance factor


def lowrank_advi_init(
    dist: Distribution, rank: int, init_scale: float = 0.1
) -> LowRankADVIParams:
    d = dist.ndims
    return LowRankADVIParams(
        mu=jnp.zeros((d,), jnp.float32),
        omega=jnp.full((d,), jnp.log(init_scale), jnp.float32),
        b=jnp.zeros((d, rank), jnp.float32),  # starts exactly mean-field
    )


def sample_q_lowrank(params: LowRankADVIParams, key: Array, n: int) -> Array:
    """z = μ + D ξ₁ + B ξ₂ ~ N(μ, D² + BBᵀ), shape (ndims, n)."""
    d, r = params.b.shape
    k1, k2 = jax.random.split(key)
    xi1 = jax.random.normal(k1, (d, n), jnp.float32)
    xi2 = jax.random.normal(k2, (r, n), jnp.float32)
    return (
        params.mu[:, None]
        + jnp.exp(params.omega)[:, None] * xi1
        + params.b @ xi2
    )


def lowrank_entropy(params: LowRankADVIParams) -> Array:
    """H(q) = ½ logdet(2πe (D² + BBᵀ)) via the determinant lemma:
    logdet = 2Σω + logdet(I_r + Bᵀ D⁻² B)."""
    d, r = params.b.shape
    dinv_b = params.b * jnp.exp(-params.omega)[:, None]  # D⁻¹B
    small = jnp.eye(r, dtype=jnp.float32) + dinv_b.T @ dinv_b
    sign, logdet_small = jnp.linalg.slogdet(small)
    logdet = 2.0 * jnp.sum(params.omega) + logdet_small
    return 0.5 * logdet + 0.5 * d * jnp.log(2.0 * jnp.pi * jnp.e)


def elbo_lowrank(
    dist: Distribution, params: LowRankADVIParams, key: Array, n_mc: int
) -> Array:
    z = sample_q_lowrank(params, key, n_mc)
    return jnp.mean(dist.logdensity(z)) + lowrank_entropy(params)


def q_covariance(params) -> Array:
    """Dense covariance of the fitted q (diagnostics / tests)."""
    dvar = jnp.exp(2.0 * params.omega)
    if isinstance(params, LowRankADVIParams):
        return jnp.diag(dvar) + params.b @ params.b.T
    return jnp.diag(dvar)


def advi_fit(
    dist: Distribution,
    key: Array,
    num_steps: int = 2000,
    n_mc: int = 64,
    learning_rate: float = 0.05,
    init_scale: float = 0.1,
    rank: int = 0,
) -> Tuple[ADVIParams, Array]:
    """Run ADVI; returns (params, elbo_trace).

    ``rank=0``: mean-field; ``rank>0``: low-rank-plus-diagonal covariance
    (``rank=dist.ndims`` ⇒ full-rank). The whole optimization is one
    ``lax.scan`` under jit — no host round trips (the TPU-native analogue
    of a Python training loop).
    """
    if rank > 0:
        params = lowrank_advi_init(dist, rank, init_scale)
        loss = lambda p, k: -elbo_lowrank(dist, p, k, n_mc)
    else:
        params = advi_init(dist, init_scale)
        loss = lambda p, k: -elbo(dist, p, k, n_mc)
    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

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
    rank: int = 0  # 0 = mean-field; ndims = full-rank

    def fit(self) -> Tuple[ADVIParams, Array]:
        key = jax.random.key(self.seed)
        fit = jax.jit(
            lambda k: advi_fit(
                self.distribution,
                k,
                self.num_steps,
                self.n_mc,
                self.learning_rate,
                rank=self.rank,
            )
        )
        self.params, self.elbo_trace = fit(key)
        return self.params, self.elbo_trace

    def sample(self, n: int, seed: int = 1) -> Array:
        if isinstance(self.params, LowRankADVIParams):
            return sample_q_lowrank(self.params, jax.random.key(seed), n)
        return sample_q(self.params, jax.random.key(seed), n)

    def covariance(self) -> Array:
        return q_covariance(self.params)
