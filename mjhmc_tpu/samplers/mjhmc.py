"""Markov Jump HMC — the paper's algorithm, TPU-native.

Implements the jump process of SURVEY.md §3.1 (normative spec; arXiv:
1509.03808): from ζ=(x,v), three competing exponential clocks

  L-clock  Γ_L(ζ)  = exp(-½[H(Lζ) − H(ζ)])          fires → ζ ← Lζ
  F-clock  Γ_F(ζ)  = max(0, Γ_L(Fζ) − Γ_L(ζ))       fires → ζ ← Fζ
  R-clock  β (constant)                              fires → v ~ N(0, I)

with the Rao-Blackwellized implementation: each iteration computes all
rates, records the expected dwell time t(ζ)=1/(Γ_L+Γ_F+β) as the sample's
weight, and picks the transition categorically ∝ rates (Gumbel-max over
log-rates — batched, branch-free).

TPU-first structure (SURVEY.md §7 design stance):

- One pure ``step`` function; the sampler is ``lax.scan`` over it. All
  per-chain branching (which clock fired, cache validity) is masked
  ``where`` blends — no data-dependent control flow under jit.
- **Fused forward+backward trajectory**: Γ_F needs H(L⁻¹ζ). After an L-step
  it is the cached H(ζ_prev); after F it is the just-computed H(Lζ); only a
  momentum refresh invalidates the cache (SURVEY.md §3.1 cache trick). Under
  batching, the refreshed subset differs per step, so instead of
  per-chain recompute branches the step runs leapfrog once on a doubled
  batch ``[ζ | Fζ]`` of shape (ndims, 2·nbatch): column block 0 yields Lζ,
  block 1 yields L(Fζ)=F L⁻¹ζ whose energy is H(L⁻¹ζ). Chains ride the TPU
  vector lanes, so the doubled batch keeps full lane utilization and the
  whole step stays a single fused XLA loop. The *algorithmic* eval counter
  still counts M (+M only for cache-invalid chains), matching the
  reference's fairness cost model; see ``wallclock_grad_evals`` for the
  hardware count.
- Numerical hardening: log-rates are clipped at ``LOG_RATE_MAX`` and
  non-finite trajectory energies get rate 0 (a chain never jumps onto a
  diverged state), mirroring HMC divergence handling.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from mjhmc_tpu.models.base import Distribution
from mjhmc_tpu.ops.leapfrog import INTEGRATORS, momentum_scale, total_energy
from mjhmc_tpu.samplers.state import MJState, make_mj_state

Array = jax.Array

# exp(25) ≈ 7e10: rates above this only shrink dwell times already ~1e-11;
# clipping keeps fp32 finite without statistically visible effect.
LOG_RATE_MAX = 25.0


class MJStepOut(NamedTuple):
    """Per-step emission (Rao-Blackwell: the *pre-transition* state + weight)."""

    x: Array  # (ndims, nbatch) dwelled-at positions
    dwell: Array  # (nbatch,) expected dwell time t(ζ)
    sel: Array  # (nbatch,) int8: 0=L fired, 1=F, 2=R
    accept_stat: Array  # (nbatch,) min(1, exp(-ΔH_L)) — dual-averaging signal
    cache_err: Array  # (nbatch,) |cached − fresh| backward H where valid (diag)


def mjhmc_step(
    dist: Distribution,
    state: MJState,
    key: Array,
    epsilon: Array | float,
    beta: Array | float,
    num_leapfrog_steps: int,
    unroll: int = 1,
    refresh_fraction: float = 1.0,
    inv_mass: Array | None = None,
    integrator: str = "leapfrog",
) -> Tuple[MJState, MJStepOut]:
    """One Rao-Blackwellized jump iteration for all chains.

    ``refresh_fraction``: R-clock momentum corruption amount. 1.0 (default)
    is the full refresh v ← ξ consistent with the paper (SURVEY.md §3.1
    notes full-vs-partial as the one detail to re-verify against the repo);
    c < 1 gives the partial corruption v ← √(1−c)·v + √c·ξ, which also
    preserves the momentum marginal and hence π-stationarity. Either way
    the cache is invalidated.

    ``inv_mass``: optional (ndims, 1) diagonal M⁻¹ preconditioner — momenta
    live in N(0, M), H = U + ½vᵀM⁻¹v (see ops.leapfrog).
    """
    chain = state.chain
    x, v, u, g = chain.x, chain.v, chain.u, chain.grad
    n = x.shape[1]
    m = num_leapfrog_steps
    beta = jnp.asarray(beta, jnp.float32)

    h_cur = total_energy(u, v, inv_mass)

    # ---- fused forward + backward trajectories, stacked on a NEW leading
    # axis (never concatenated along the chain axis: the chain axis is the
    # sharded one, and concatenating it would force GSPMD to all-gather in
    # the hot loop — tests/test_collectives.py pins this)
    step_fn, evals_per_step = INTEGRATORS[integrator]
    x2 = jnp.stack([x, x])
    v2 = jnp.stack([v, -v])
    g2 = jnp.stack([g, g])
    x2f, v2f, u2f, g2f = step_fn(
        dist.potential_and_grad, x2, v2, g2, epsilon, m, unroll=unroll,
        inv_mass=inv_mass,
    )
    x_l, v_l = x2f[0], v2f[0]
    u_l, g_l = u2f[0], g2f[0]
    h_l = total_energy(u_l, v_l, inv_mass)  # H(Lζ)
    h_back_fresh = total_energy(u2f[1], v2f[1], inv_mass)  # H(L⁻¹ζ)

    cache_err = jnp.where(
        state.back_valid, jnp.abs(state.h_back - h_back_fresh), 0.0
    )
    h_back = jnp.where(state.back_valid, state.h_back, h_back_fresh)

    # ---- transition rates (log space, clipped, divergence-guarded) --------
    def log_rate(h_to):
        raw = -0.5 * (h_to - h_cur)
        return jnp.where(
            jnp.isfinite(h_to), jnp.minimum(raw, LOG_RATE_MAX), -jnp.inf
        )

    log_gl = log_rate(h_l)  # log Γ_L(ζ)
    log_glf = log_rate(h_back)  # log Γ_L(Fζ)
    gamma_l = jnp.exp(log_gl)
    gamma_f = jnp.maximum(0.0, jnp.exp(log_glf) - gamma_l)
    total_rate = gamma_l + gamma_f + beta
    dwell = 1.0 / total_rate

    # ---- categorical transition via Gumbel-max over log-rates -------------
    k_gum, k_refresh = jax.random.split(key)
    log_rates = jnp.stack(
        [log_gl, jnp.log(gamma_f), jnp.broadcast_to(jnp.log(beta), (n,))]
    )  # (3, n); log(0) = -inf is a valid Gumbel-max entry
    gum = jax.random.gumbel(k_gum, (3, n), jnp.float32)
    sel = jnp.argmax(log_rates + gum, axis=0).astype(jnp.int8)
    is_l = sel == 0
    is_f = sel == 1
    is_r = sel == 2

    # ---- apply L / F / R as masked blends ---------------------------------
    xi = momentum_scale(inv_mass) * jax.random.normal(k_refresh, v.shape, v.dtype)
    if refresh_fraction >= 1.0:
        v_fresh = xi
    else:
        c = jnp.float32(refresh_fraction)
        v_fresh = jnp.sqrt(1.0 - c) * v + jnp.sqrt(c) * xi
    bl = is_l[None, :]
    x_new = jnp.where(bl, x_l, x)
    # sel is exactly one of {L, F, R}: not-L and not-F ⟹ refresh
    v_new = jnp.where(bl, v_l, jnp.where(is_f[None, :], -v, v_fresh))
    u_new = jnp.where(is_l, u_l, u)
    g_new = jnp.where(bl, g_l, g)
    # cache state machine: L → H(ζ) becomes the backward energy; F → H(Lζ);
    # R → invalid (next step's fused backward pass refills it).
    h_back_new = jnp.where(is_l, h_cur, jnp.where(is_f, h_l, h_back))
    back_valid_new = ~is_r

    m_cost = evals_per_step * m  # 2M for the two-stage integrator
    evals = state.grad_evals + jnp.int32(m_cost) + jnp.where(
        state.back_valid, 0, jnp.int32(m_cost)
    )

    new_state = MJState(
        chain=chain._replace(x=x_new, v=v_new, u=u_new, grad=g_new),
        h_back=h_back_new,
        back_valid=back_valid_new,
        grad_evals=evals,
        dwell_sum=state.dwell_sum + dwell,
    )
    out = MJStepOut(
        x=x,
        dwell=dwell,
        sel=sel,
        # divergence-guarded: a non-finite trajectory is a rejection (0),
        # not a NaN that would poison the dual-averaging state
        accept_stat=jnp.where(
            jnp.isfinite(h_l), jnp.exp(jnp.minimum(0.0, h_cur - h_l)), 0.0
        ),
        cache_err=cache_err,
    )
    return new_state, out


class MomentAccumulator(NamedTuple):
    """Streaming dwell-weighted sufficient statistics (per chain)."""

    w: Array  # (nbatch,) Σ t
    wx: Array  # (ndims, nbatch) Σ t·x
    wx2: Array  # (ndims, nbatch) Σ t·x²

    @classmethod
    def init(cls, ndims: int, nbatch: int) -> "MomentAccumulator":
        return cls(
            w=jnp.zeros((nbatch,), jnp.float32),
            wx=jnp.zeros((ndims, nbatch), jnp.float32),
            wx2=jnp.zeros((ndims, nbatch), jnp.float32),
        )

    def update(self, x: Array, w: Array) -> "MomentAccumulator":
        return MomentAccumulator(
            w=self.w + w, wx=self.wx + w * x, wx2=self.wx2 + w * x * x
        )

    def mean(self) -> Array:
        """(ndims,) dwell-weighted posterior mean across all chains/steps."""
        return jnp.sum(self.wx, axis=1) / jnp.sum(self.w)

    def var(self) -> Array:
        """(ndims,) dwell-weighted posterior marginal variance."""
        w = jnp.sum(self.w)
        m = jnp.sum(self.wx, axis=1) / w
        return jnp.sum(self.wx2, axis=1) / w - m * m


def mjhmc_run(
    dist: Distribution,
    state: MJState,
    key: Array,
    num_steps: int,
    epsilon: Array | float,
    beta: Array | float,
    num_leapfrog_steps: int,
    unroll: int = 1,
    collect: str = "samples",
    thin: int = 1,
    refresh_fraction: float = 1.0,
    inv_mass: Array | None = None,
    integrator: str = "leapfrog",
) -> Tuple[MJState, dict]:
    """Scan ``num_steps`` jump iterations.

    collect="samples": returns xs (num_steps//thin, ndims, nbatch) + dwell.
    collect="stats":   returns only streaming weighted moments + counters
                       (O(1) memory — for long benchmark runs).
    """
    keys = jax.random.split(key, num_steps)
    ndims, nbatch = state.chain.x.shape

    if collect == "samples":

        def body(carry, k):
            s, o = mjhmc_step(
                dist, carry, k, epsilon, beta, num_leapfrog_steps, unroll,
                refresh_fraction, inv_mass, integrator,
            )
            # chain-mean cumulative eval counter after this step: the exact
            # fairness-axis trajectory (SURVEY.md §3.3) — lag→evals alignment
            # uses the actual counter path, not an average rate
            ev = jnp.mean(s.grad_evals.astype(jnp.float32))
            return s, (o.x, o.dwell, o.sel, o.accept_stat, o.cache_err, ev)

        state, (xs, dwell, sel, acc, cerr, ev) = lax.scan(body, state, keys)
        if thin > 1:
            xs, dwell, sel, ev = xs[::thin], dwell[::thin], sel[::thin], ev[::thin]
        return state, {
            "x": xs,
            "dwell": dwell,
            "sel": sel,
            "accept_stat": acc,
            "cache_err": cerr,
            "evals_mean": ev,
        }

    if collect == "stats":
        acc0 = MomentAccumulator.init(ndims, nbatch)

        def body(carry, k):
            s, a = carry
            s, o = mjhmc_step(
                dist, s, k, epsilon, beta, num_leapfrog_steps, unroll,
                refresh_fraction, inv_mass, integrator,
            )
            return (s, a.update(o.x, o.dwell)), None

        (state, acc), _ = lax.scan(body, (state, acc0), keys)
        return state, {"moments": acc}

    raise ValueError(f"unknown collect mode: {collect}")


# --------------------------------------------------------------------------
# Reference-style class wrapper (SURVEY.md L3 public interface:
# Sampler(distribution, epsilon, beta, num_leapfrog_steps); .sample(n),
# .sampling_iteration(), .burn_in()).
# --------------------------------------------------------------------------
@dataclasses.dataclass
class MarkovJumpHMC:
    distribution: Distribution
    epsilon: float = 1.0
    beta: float = 0.1
    num_leapfrog_steps: int = 5
    nbatch: int = 128
    seed: int = 0
    unroll: int = 1
    integrator: str = "leapfrog"  # or "two_stage" (arXiv:1912.03253; 2M cost)
    # diagonal mass matrix M per dim. Stan convention: the INVERSE mass is
    # set to the target covariance diagonal, so pass mass_diag = 1/variance
    # (precision) for optimal preconditioning.
    mass_diag: tuple | None = None

    def __post_init__(self):
        self._key = jax.random.key(self.seed)
        self._key, k0 = jax.random.split(self._key)
        self.state = make_mj_state(self.distribution, k0, self.nbatch)
        inv_mass = None
        if self.mass_diag is not None:
            import numpy as _np

            inv_mass = jnp.asarray(
                1.0 / _np.asarray(self.mass_diag, _np.float32)
            )[:, None]
            # momenta must start in N(0, M)
            self.state = self.state._replace(
                chain=self.state.chain._replace(
                    v=self.state.chain.v / jnp.sqrt(inv_mass)
                )
            )
        self._run = jax.jit(
            lambda s, k, n_steps, collect: mjhmc_run(
                self.distribution,
                s,
                k,
                n_steps,
                self.epsilon,
                self.beta,
                self.num_leapfrog_steps,
                self.unroll,
                collect,
                inv_mass=inv_mass,
                integrator=self.integrator,
            ),
            static_argnums=(2, 3),
        )

    def _next_key(self) -> Array:
        self._key, k = jax.random.split(self._key)
        return k

    def sampling_iteration(self) -> MJStepOut:
        """One jump iteration across all chains."""
        self.state, outs = self._run(self.state, self._next_key(), 1, "samples")
        return outs

    def sample(self, num_steps: int) -> dict:
        """Run ``num_steps`` iterations; returns samples + dwell weights."""
        self.state, outs = self._run(
            self.state, self._next_key(), num_steps, "samples"
        )
        return outs

    def burn_in(self, num_steps: int = 500) -> None:
        """Advance chains and reset counters/accumulators."""
        self.state, _ = self._run(self.state, self._next_key(), num_steps, "stats")
        self.state = self.state._replace(
            grad_evals=jnp.zeros_like(self.state.grad_evals),
            dwell_sum=jnp.zeros_like(self.state.dwell_sum),
        )

    @property
    def grad_evals(self) -> int:
        """Total algorithmic gradient evaluations (the fairness currency)."""
        return int(jnp.sum(self.state.grad_evals))

    @property
    def dwelling_times(self) -> Array:
        """Accumulated Rao-Blackwell dwell mass per chain (the reference's
        ``dwelling_times`` attribute, SURVEY.md §2.3)."""
        return self.state.dwell_sum

    def shard(self, mesh=None) -> "MarkovJumpHMC":
        """Shard chain state over a ('chains',) mesh (all devices by
        default). The hot loop stays collective-free; returns self."""
        from mjhmc_tpu.parallel.mesh import make_chain_mesh, shard_chain_pytree

        mesh = mesh or make_chain_mesh()
        self.state = shard_chain_pytree(self.state, mesh)
        return self
