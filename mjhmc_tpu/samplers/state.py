"""Chain-state pytrees carried through the sampler scans.

TPU-native replacement for the reference's mutable per-sampler state
(SURVEY.md §2.3: ``X, V, EX, dEdX`` caches + ``dwelling_times`` + the
distribution-held eval counters): everything lives in one immutable pytree
threaded through ``lax.scan``, with per-chain validity masks instead of
Python-side branching, and traced integer counters instead of object
attributes (SURVEY.md §5 "Metrics").

Layout: arrays are (ndims, nbatch) / (nbatch,) — chains on the last (lane)
axis; the chain axis is the one sharded over the device mesh.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class ChainState(NamedTuple):
    """State shared by the continuous-state samplers.

    ``u``/``grad`` cache the potential and its gradient at ``x`` so every
    trajectory starts from a cached gradient (M evals per M-step trajectory,
    the paper's cost model — SURVEY.md §3.1 cache trick).
    """

    x: Array  # (ndims, nbatch) positions
    v: Array  # (ndims, nbatch) momenta
    u: Array  # (nbatch,) potential U(x)
    grad: Array  # (ndims, nbatch) dU/dx

    @property
    def nbatch(self) -> int:
        return self.x.shape[1]

    @property
    def ndims(self) -> int:
        return self.x.shape[0]


class MJState(NamedTuple):
    """Markov-jump HMC carry = ChainState + backward-energy cache + counters.

    ``h_back`` caches H(L⁻¹ζ) (the previous rung of the current trajectory);
    ``back_valid`` marks chains whose cache survives (invalidated only by a
    momentum refresh — SURVEY.md §3.1 cache state machine).
    """

    chain: ChainState
    h_back: Array  # (nbatch,) cached H(L⁻¹ζ)
    back_valid: Array  # (nbatch,) bool
    grad_evals: Array  # (nbatch,) int32 — algorithmic gradient-eval counter
    dwell_sum: Array  # (nbatch,) f32 — Σ dwell weights (Rao-Blackwell mass)


class HMCState(NamedTuple):
    """Control/standard HMC carry."""

    chain: ChainState
    grad_evals: Array  # (nbatch,) int32
    n_accept: Array  # (nbatch,) int32


def make_chain_state(dist, key: Array, nbatch: int) -> ChainState:
    """Fresh chain state: x ~ dist.init_x, v ~ N(0, I), caches filled."""
    kx, kv = jax.random.split(key)
    x = dist.init_x(kx, nbatch)
    v = jax.random.normal(kv, x.shape, x.dtype)
    u, g = dist.potential_and_grad(x)
    return ChainState(x=x, v=v, u=u, grad=g)


def make_mj_state(dist, key: Array, nbatch: int) -> MJState:
    chain = make_chain_state(dist, key, nbatch)
    n = nbatch
    return MJState(
        chain=chain,
        h_back=jnp.zeros((n,), jnp.float32),
        back_valid=jnp.zeros((n,), bool),  # no backward cache at t=0
        grad_evals=jnp.zeros((n,), jnp.int32),
        dwell_sum=jnp.zeros((n,), jnp.float32),
    )


def make_hmc_state(dist, key: Array, nbatch: int) -> HMCState:
    chain = make_chain_state(dist, key, nbatch)
    n = nbatch
    return HMCState(
        chain=chain,
        grad_evals=jnp.zeros((n,), jnp.int32),
        n_accept=jnp.zeros((n,), jnp.int32),
    )
