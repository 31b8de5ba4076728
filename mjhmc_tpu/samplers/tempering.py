"""Parallel tempering (replica exchange) — the multimodal-sampling head.

Beyond-reference capability (the reference, SURVEY.md §2.3, has no
mechanism for well-separated modes; its samplers are single-temperature).
T replicas per chain target the tempered densities p_t(x) ∝ exp(−β_t U(x))
on a geometric inverse-temperature ladder β_0 < … < β_{T−1} = 1; each
iteration runs one full-refresh HMC update per replica followed by an
even/odd Metropolis exchange of adjacent temperatures
(log α = (β_{t+1} − β_t)(U_{t+1} − U_t)).

TPU-native structure: the temperature ladder rides a NEW LEADING axis
(T, ndims, nbatch) — every energy here is rank-polymorphic (reduce
axis=-2, chain axis last), so one un-vmapped leapfrog integrates all T
replicas of all chains at once and the chain axis keeps its mesh sharding.
Replica exchange is jnp.roll/where blends along the unsharded temperature
axis — zero collectives in the hot loop (tests/test_collectives invariant
applies: never touch the chain/dim axes).

Hotter replicas take √(1/β_t)-scaled step sizes (the tempered target
widens as 1/√β), keeping acceptance roughly flat across the ladder.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mjhmc_tpu.models.base import Distribution
from mjhmc_tpu.ops.leapfrog import kinetic_energy, leapfrog
from mjhmc_tpu.samplers.mjhmc import MomentAccumulator

Array = jax.Array


class PTState(NamedTuple):
    """Replica-exchange carry. Leading axis = temperature ladder (size T)."""

    x: Array  # (T, d, n) positions
    u: Array  # (T, n) BASE potential U(x_t) (untempered — swap currency)
    grad: Array  # (T, d, n) base gradient dU/dx
    grad_evals: Array  # (n,) int32 — T·M per iteration (all replicas counted)
    n_accept: Array  # (T, n) int32 HMC accepts per replica
    n_swap_acc: Array  # (T-1, n) int32 accepted exchanges per adjacent pair
    n_swap_try: Array  # (T-1, n) int32 attempted exchanges per adjacent pair
    replica_id: Array  # (T, n) int32 — which original replica occupies rung t
    seen_hot: Array  # (T, n) bool per ORIGINAL replica: visited rung 0
    round_trips: Array  # (T, n) int32 per original replica: hot→cold passages
    n_iter: Array = None  # () int32 explicit PT iteration count — the health
    # metrics' denominator (grad_evals gets reset by burn_in; inferring the
    # iteration count from it silently mis-scales after any counter reset)


class PTStepOut(NamedTuple):
    x: Array  # (d, n) target-temperature (β=1) positions
    accept: Array  # (T, n) bool per-replica HMC accepts
    swap_accept: Array  # (T-1, n) bool exchange accepts this step


def geometric_ladder(num_temps: int, beta_min: float) -> np.ndarray:
    """Geometric β ladder from ``beta_min`` to 1.0 (ascending), length T."""
    if num_temps == 1:
        return np.ones(1, np.float32)
    return (beta_min ** np.linspace(1.0, 0.0, num_temps)).astype(np.float32)


def make_pt_state(
    dist: Distribution, key: Array, nbatch: int, num_temps: int
) -> PTState:
    """All replicas start at the same init draw (burn-in separates them)."""
    x0 = dist.init_x(key, nbatch)  # (d, n)
    x = jnp.broadcast_to(x0, (num_temps,) + x0.shape)
    u, g = dist.potential_and_grad(x)
    t1 = max(num_temps - 1, 1)
    return PTState(
        x=x,
        u=u,
        grad=g,
        grad_evals=jnp.zeros((nbatch,), jnp.int32),
        n_accept=jnp.zeros((num_temps, nbatch), jnp.int32),
        n_swap_acc=jnp.zeros((t1, nbatch), jnp.int32),
        n_swap_try=jnp.zeros((t1, nbatch), jnp.int32),
        replica_id=jnp.broadcast_to(
            jnp.arange(num_temps, dtype=jnp.int32)[:, None],
            (num_temps, nbatch),
        ),
        seen_hot=jnp.zeros((num_temps, nbatch), bool),
        round_trips=jnp.zeros((num_temps, nbatch), jnp.int32),
        n_iter=jnp.int32(0),
    )


def pt_step(
    dist: Distribution,
    state: PTState,
    key: Array,
    parity: Array,
    betas: Array,
    epsilon: Array | float,
    num_leapfrog_steps: int,
    unroll: int = 1,
    scale_eps: bool = True,
) -> Tuple[PTState, PTStepOut]:
    """One PT iteration: per-replica HMC update, then even/odd exchange.

    ``parity`` (traced int32 0/1) selects which adjacent pairs attempt an
    exchange this step; alternating it per iteration gives the standard
    deterministic even-odd sweep.
    """
    num_temps = state.x.shape[0]
    bt = betas[:, None]  # (T, 1) over chains
    btd = betas[:, None, None]  # (T, 1, 1) over (dim, chains)
    eps = jnp.asarray(epsilon, jnp.float32)
    eps_t = eps * lax.rsqrt(btd) if scale_eps else eps * jnp.ones_like(btd)

    k_mom, k_mh, k_swap = jax.random.split(key, 3)

    # ---- per-replica full-refresh HMC on the tempered target β_t·U -------
    v = jax.random.normal(k_mom, state.x.shape, state.x.dtype)
    h0 = bt * state.u + kinetic_energy(v)

    def tempered_pg(x):
        u, g = dist.potential_and_grad(x)
        return bt * u, btd * g

    x_l, v_l, hu_l, hg_l = leapfrog(
        tempered_pg, state.x, v, btd * state.grad, eps_t,
        num_leapfrog_steps, unroll,
    )
    h_l = hu_l + kinetic_energy(v_l)

    log_p = jnp.minimum(0.0, h0 - h_l)
    log_un = jnp.log(jax.random.uniform(k_mh, log_p.shape, jnp.float32))
    accept = (log_un < log_p) & jnp.isfinite(h_l)  # (T, n)

    # base-unit caches at the endpoint: exact rescale of the tempered values
    # the integrator already computed — no extra gradient evaluation
    u_l, g_l = hu_l / bt, hg_l / btd
    ba = accept[:, None, :]
    x = jnp.where(ba, x_l, state.x)
    u = jnp.where(accept, u_l, state.u)
    g = jnp.where(ba, g_l, state.grad)

    # ---- even/odd replica exchange along the (unsharded) ladder axis -----
    if num_temps > 1:
        # log α for pair (t, t+1): (β_{t+1} − β_t)(U_{t+1} − U_t)
        log_a = (betas[1:] - betas[:-1])[:, None] * (u[1:] - u[:-1])  # (T-1, n)
        active = ((jnp.arange(num_temps - 1) % 2) == parity)[:, None]
        log_us = jnp.log(jax.random.uniform(k_swap, log_a.shape, jnp.float32))
        swap = active & (log_us < log_a)  # (T-1, n)

        pad_lo = [(1, 0)] + [(0, 0)] * (swap.ndim - 1)
        pad_hi = [(0, 1)] + [(0, 0)] * (swap.ndim - 1)
        with_next = jnp.pad(swap, pad_hi)  # (T, n): t trades with t+1
        with_prev = jnp.pad(swap, pad_lo)  # (T, n): t trades with t−1

        def exchange(a, mask_next, mask_prev):
            up = jnp.roll(a, -1, axis=0)  # value from t+1
            down = jnp.roll(a, 1, axis=0)  # value from t−1
            return jnp.where(mask_next, up, jnp.where(mask_prev, down, a))

        bn = with_next[:, None, :]
        bp = with_prev[:, None, :]
        x = exchange(x, bn, bp)
        u = exchange(u, with_next, with_prev)
        g = exchange(g, bn, bp)
        rid = exchange(state.replica_id, with_next, with_prev)
        n_swap_acc = state.n_swap_acc + swap.astype(jnp.int32)
        n_swap_try = state.n_swap_try + active.astype(jnp.int32)

        # ---- replica-flow health: hot→cold passages per original replica.
        # A "round trip" completes when a replica that has touched the
        # hottest rung (index 0, β_min) reaches the cold target rung
        # (index T−1, β=1); the flag resets so repeated passages count.
        rep_ids = jnp.arange(num_temps, dtype=jnp.int32)[:, None]  # (T, 1)
        at_hot = rid[0][None, :] == rep_ids  # (T, n): r sits at rung 0
        at_cold = rid[-1][None, :] == rep_ids  # r sits at the cold rung
        seen_hot = state.seen_hot | at_hot
        completed = at_cold & seen_hot
        round_trips = state.round_trips + completed.astype(jnp.int32)
        seen_hot = seen_hot & ~completed
    else:
        swap = jnp.zeros((1, state.x.shape[-1]), bool)
        rid = state.replica_id
        n_swap_acc, n_swap_try = state.n_swap_acc, state.n_swap_try
        seen_hot, round_trips = state.seen_hot, state.round_trips

    new_state = PTState(
        x=x,
        u=u,
        grad=g,
        grad_evals=state.grad_evals
        + jnp.int32(num_temps * num_leapfrog_steps),
        n_accept=state.n_accept + accept.astype(jnp.int32),
        n_swap_acc=n_swap_acc,
        n_swap_try=n_swap_try,
        replica_id=rid,
        seen_hot=seen_hot,
        round_trips=round_trips,
        n_iter=state.n_iter + jnp.int32(1),
    )
    return new_state, PTStepOut(x=x[-1], accept=accept, swap_accept=swap)


def pt_run(
    dist: Distribution,
    state: PTState,
    key: Array,
    num_steps: int,
    betas: Array,
    epsilon: Array | float,
    num_leapfrog_steps: int,
    unroll: int = 1,
    scale_eps: bool = True,
    collect: str = "samples",
) -> Tuple[PTState, dict]:
    """Scan ``num_steps`` PT iterations with alternating exchange parity."""
    keys = jax.random.split(key, num_steps)
    parities = jnp.arange(num_steps, dtype=jnp.int32) % 2
    ndims, nbatch = state.x.shape[1:]

    if collect == "samples":

        def body(carry, kp):
            k, p = kp
            s, o = pt_step(
                dist, carry, k, p, betas, epsilon, num_leapfrog_steps,
                unroll, scale_eps,
            )
            # chain-mean cumulative eval counter after this step — the exact
            # fairness-axis trajectory (SURVEY.md §3.3); all T replicas charged
            return s, (o.x, jnp.mean(s.grad_evals.astype(jnp.float32)))

        state, (xs, ev) = lax.scan(body, state, (keys, parities))
        return state, {"x": xs, "evals_mean": ev}

    if collect == "stats":
        acc0 = MomentAccumulator.init(ndims, nbatch)
        ones = jnp.ones((nbatch,), jnp.float32)

        def body(carry, kp):
            k, p = kp
            s, a = carry
            s, o = pt_step(
                dist, s, k, p, betas, epsilon, num_leapfrog_steps,
                unroll, scale_eps,
            )
            return (s, a.update(o.x, ones)), None

        (state, acc), _ = lax.scan(body, (state, acc0), (keys, parities))
        return state, {"moments": acc}

    raise ValueError(f"unknown collect mode: {collect}")


def update_ladder(
    betas: np.ndarray,
    swap_rates: np.ndarray,
    target: float = 0.4,
    eta: float = 0.6,
) -> np.ndarray:
    """One Robbins-Monro ladder update toward uniform swap acceptance.

    Parameterizes the ladder by its log-β gaps uₜ = log β_{t+1} − log β_t
    (β_{T−1} ≡ 1 stays pinned) and scales each gap by exp(η·(rₜ − r*)):
    a pair swapping more often than the target ``r*`` earns a wider gap,
    a cold pair a narrower one — the standard stochastic-approximation
    tuning for replica exchange (Miasojedow et al., adaptive PT).
    """
    b = np.asarray(betas, np.float64)
    if b.size == 1:
        return b.astype(np.float32)
    u = np.diff(np.log(b))  # (T-1,) positive gaps
    u = np.clip(u * np.exp(eta * (np.asarray(swap_rates) - target)), 1e-4, 20.0)
    log_b = -np.concatenate([np.cumsum(u[::-1])[::-1], [0.0]])
    return np.exp(log_b).astype(np.float32)


@dataclasses.dataclass
class ParallelTempering:
    """Reference-style wrapper (mirrors ControlHMC's L3 interface)."""

    distribution: Distribution
    epsilon: float = 0.5
    num_leapfrog_steps: int = 5
    nbatch: int = 128
    num_temps: int = 6
    beta_min: float = 0.05
    seed: int = 0
    unroll: int = 1
    scale_eps: bool = True

    def __post_init__(self):
        self.betas = jnp.asarray(geometric_ladder(self.num_temps, self.beta_min))
        self._key = jax.random.key(self.seed)
        self._key, k0 = jax.random.split(self._key)
        self.state = make_pt_state(
            self.distribution, k0, self.nbatch, self.num_temps
        )
        # betas is a traced argument so ladder adaptation never recompiles
        self._run_b = jax.jit(
            lambda s, k, betas, n, collect: pt_run(
                self.distribution,
                s,
                k,
                n,
                betas,
                self.epsilon,
                self.num_leapfrog_steps,
                self.unroll,
                self.scale_eps,
                collect,
            ),
            static_argnums=(3, 4),
        )

    def _run(self, s, k, n, collect):
        return self._run_b(s, k, self.betas, n, collect)

    def _next_key(self) -> Array:
        self._key, k = jax.random.split(self._key)
        return k

    def adapt_ladder(
        self,
        num_windows: int = 20,
        window_size: int = 50,
        target: float = 0.4,
        eta: float = 0.6,
    ) -> np.ndarray:
        """Windowed warmup tuning β toward uniform swap acceptance.

        Runs ``num_windows`` windows of ``window_size`` PT iterations;
        after each, applies :func:`update_ladder` to the per-pair swap
        rates measured in that window alone. One compile total (betas is
        a traced argument of the jitted run). Returns the tuned ladder.
        """
        for _ in range(num_windows):
            acc0 = np.asarray(self.state.n_swap_acc, np.float64)
            try0 = np.asarray(self.state.n_swap_try, np.float64)
            self.state, _ = self._run(
                self.state, self._next_key(), window_size, "stats"
            )
            d_acc = np.asarray(self.state.n_swap_acc) - acc0
            d_try = np.maximum(np.asarray(self.state.n_swap_try) - try0, 1.0)
            rates = (d_acc.mean(axis=-1)) / (d_try.mean(axis=-1))
            self.betas = jnp.asarray(
                update_ladder(np.asarray(self.betas), rates, target, eta)
            )
        return np.asarray(self.betas)

    def sample(self, num_steps: int) -> dict:
        """β=1 chain positions, shape (num_steps, ndims, nbatch)."""
        self.state, outs = self._run(self.state, self._next_key(), num_steps, "samples")
        return outs

    def burn_in(self, num_steps: int = 500) -> None:
        self.state, _ = self._run(self.state, self._next_key(), num_steps, "stats")
        self.state = self.state._replace(
            grad_evals=jnp.zeros_like(self.state.grad_evals),
            n_accept=jnp.zeros_like(self.state.n_accept),
            n_swap_acc=jnp.zeros_like(self.state.n_swap_acc),
            n_swap_try=jnp.zeros_like(self.state.n_swap_try),
            seen_hot=jnp.zeros_like(self.state.seen_hot),
            round_trips=jnp.zeros_like(self.state.round_trips),
            n_iter=jnp.zeros_like(self.state.n_iter),
        )

    @property
    def accept_rates(self) -> np.ndarray:
        """Mean HMC acceptance per temperature, shape (T,)."""
        n = max(int(self.state.n_iter), 1)
        return np.asarray(self.state.n_accept.mean(axis=-1) / n)

    @property
    def swap_rates(self) -> np.ndarray:
        """Mean exchange acceptance per adjacent pair, shape (T-1,)."""
        tries = np.maximum(np.asarray(self.state.n_swap_try), 1)
        return np.asarray(self.state.n_swap_acc).mean(axis=-1) / tries.mean(axis=-1)

    @property
    def round_trip_rate(self) -> float:
        """Mean completed hot→cold passages per replica per iteration —
        the standard PT mixing-health metric (higher is better; 0 means
        replicas are not actually traversing the ladder)."""
        n_iters = max(int(self.state.n_iter), 1)
        return float(np.asarray(self.state.round_trips).mean() / n_iters)

    @property
    def grad_evals(self) -> int:
        return int(jnp.sum(self.state.grad_evals))
