"""NUTS baseline — iterative, fixed-budget, TPU-native.

Required by the north star alongside MJHMC (SURVEY.md §2.9; arXiv:1111.4246).
This is a from-scratch **iterative** formulation (no recursion — XLA traces
a static program):

- progressive doubling up to a static ``max_depth`` with **early exit**:
  a ``lax.while_loop`` over doubling rounds stops as soon as every chain
  is done, and ``lax.switch`` dispatches each round to a statically-shaped
  subtree kernel specialized per depth (so leaf bodies carry no masked
  work for depths they cannot reach). Within a subtree, a second while
  loop exits once every chain has stopped. Wall-clock therefore tracks the
  TYPICAL tree depth, not the 2^max_depth − 1 worst case, while every
  shape stays static (TPU-legal). Per-chain ``done`` masks freeze stopped
  chains inside a live round; the *algorithmic* eval counters only count
  unmasked steps (SURVEY.md §4.4);
- within-subtree U-turn checks via the binary-counter stack trick: leaf
  ``i`` is stored in slot ``m`` when ``i % 2^m == 0``; when leaf ``i``
  completes a span of size 2^m (``(i+1) % 2^m == 0``) it is checked against
  the stored left endpoint — all as masked writes/reads over a
  ``(max_depth, ndims, nbatch)`` stack, no data-dependent control flow;
- multinomial (progressive) sampling of the proposal within subtrees and
  biased progressive sampling when merging a subtree into the tree, in log
  space;
- divergence guard at ΔH > divergence_threshold.

Momenta are kept in the *trajectory frame* (pointing minus → plus);
backward integration negates on entry and exit. Sign-flip invariance makes
the in-subtree checks frame-independent.

Layout and conventions match the other samplers: (ndims, nbatch), chains on
lanes, one fused ``potential_and_grad`` per leapfrog, gradients cached at
both tree endpoints so each leaf costs exactly one gradient evaluation.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from mjhmc_tpu.models.base import Distribution
from mjhmc_tpu.ops.leapfrog import total_energy
from mjhmc_tpu.samplers.state import ChainState, make_chain_state

Array = jax.Array


class NUTSState(NamedTuple):
    x: Array  # (ndims, nbatch)
    u: Array  # (nbatch,) potential at x
    grad: Array  # (ndims, nbatch) dU/dx at x
    grad_evals: Array  # (nbatch,) int32 algorithmic counter


class NUTSStepOut(NamedTuple):
    x: Array  # (ndims, nbatch) new positions
    depth: Array  # (nbatch,) int32 tree depth reached
    accept_stat: Array  # (nbatch,) mean MH stat over visited leaves (for DA)
    diverged: Array  # (nbatch,) bool
    n_leaves: Array  # (nbatch,) int32 leaves actually integrated


def make_nuts_state(dist: Distribution, key: Array, nbatch: int) -> NUTSState:
    x = dist.init_x(key, nbatch)
    u, g = dist.potential_and_grad(x)
    return NUTSState(x=x, u=u, grad=g, grad_evals=jnp.zeros((nbatch,), jnp.int32))


def _dot(a: Array, b: Array) -> Array:
    """Per-chain dot product: (d, n)·(d, n) → (n,)."""
    return jnp.sum(a * b, axis=0)


def nuts_step(
    dist: Distribution,
    state: NUTSState,
    key: Array,
    epsilon: Array | float,
    max_depth: int = 8,
    divergence_threshold: float = 1000.0,
    inv_mass: Array | None = None,
) -> Tuple[NUTSState, NUTSStepOut]:
    """One NUTS iteration for all chains.

    ``inv_mass``: optional (ndims, 1) diagonal M⁻¹ (Stan convention —
    set it to the target covariance diagonal). Momenta ~ N(0, M); the
    U-turn criterion projects Δx onto *velocities* M⁻¹v.
    """
    d, n = state.x.shape
    eps = jnp.asarray(epsilon, jnp.float32)
    mscale = 1.0 if inv_mass is None else jnp.sqrt(1.0 / inv_mass)

    def vel(v):  # momentum → velocity (metric-aware U-turn projection)
        return v if inv_mass is None else inv_mass * v

    k_mom, k_tree = jax.random.split(key)
    v0 = mscale * jax.random.normal(k_mom, (d, n), jnp.float32)
    h0 = total_energy(state.u, v0, inv_mass)

    def leapfrog1(x, v, g, eps):
        v_half = v - 0.5 * eps * g
        x_new = x + eps * vel(v_half)
        u_new, g_new = dist.potential_and_grad(x_new)
        v_new = v_half - 0.5 * eps * g_new
        return x_new, v_new, u_new, g_new

    def make_subtree(j):
        """Depth-j subtree kernel (static shapes specialized per depth —
        ``lax.switch`` branch). Integrates up to 2^j leaves outward from
        the chosen tree endpoint with in-subtree U-turn checks via the
        binary-counter stack, exiting the leaf loop early once every chain
        has stopped."""

        def subtree(rc):
            (key, x_minus, v_minus, g_minus, x_plus, v_plus, g_plus,
             x_prop, u_prop, g_prop, log_w_tree, done, diverged,
             depth_reached, n_leaves, sum_alpha, n_alpha) = rc
            key, k_dir, k_leaves, k_merge = jax.random.split(key, 4)
            go_right = jax.random.bernoulli(k_dir, 0.5, (n,))

            # integration start: outward from the chosen endpoint,
            # integration frame (backward → negate trajectory-frame v)
            gr = go_right[None, :]
            x_c = jnp.where(gr, x_plus, x_minus)
            v_c = jnp.where(gr, v_plus, -v_minus)
            g_c = jnp.where(gr, g_plus, g_minus)

            # stack rows 1..j only — deeper rows cannot be touched at this
            # depth, so the specialized branch does not carry them
            stack_x = jnp.zeros((j + 1, d, n), jnp.float32)
            stack_v = jnp.zeros((j + 1, d, n), jnp.float32)

            def leaf_body(carry):
                (i, x_c, v_c, g_c, stack_x, stack_v, sub_stop, sub_div,
                 log_w_sub, xp_sub, up_sub, gp_sub, sa, na, nl) = carry
                active = (~done) & (~sub_stop)  # (n,)
                am = active[None, :]

                x_n, v_n, u_n, g_n = leapfrog1(x_c, v_c, g_c, eps)
                x_c = jnp.where(am, x_n, x_c)
                v_c = jnp.where(am, v_n, v_c)
                g_c = jnp.where(am, g_n, g_c)
                nl = nl + active.astype(jnp.int32)

                h = total_energy(u_n, v_c, inv_mass)
                delta_h = h - h0
                div_now = active & (
                    ~jnp.isfinite(h) | (delta_h > divergence_threshold)
                )
                sub_div = sub_div | div_now

                log_w_leaf = jnp.where(active & ~div_now, -delta_h, -jnp.inf)
                log_w_new = jnp.logaddexp(log_w_sub, log_w_leaf)
                # progressive multinomial within the subtree
                lu = jnp.log(
                    jax.random.uniform(jax.random.fold_in(k_leaves, i), (n,))
                )
                take = active & (lu < (log_w_leaf - log_w_new))
                tm = take[None, :]
                xp_sub = jnp.where(tm, x_c, xp_sub)
                up_sub = jnp.where(take, u_n, up_sub)
                gp_sub = jnp.where(tm, g_c, gp_sub)
                log_w_sub = jnp.where(active, log_w_new, log_w_sub)

                sa = sa + jnp.where(
                    active, jnp.exp(jnp.minimum(0.0, -delta_h)), 0.0
                )
                na = na + active.astype(jnp.float32)

                # stack stores: leaf i is a span left endpoint where
                # i % 2^m == 0 (i is traced → bitmask form)
                for m in range(1, j + 1):
                    store = active & (jnp.bitwise_and(i, 2**m - 1) == 0)
                    sm = store[None, :]
                    stack_x = stack_x.at[m].set(
                        jnp.where(sm, x_c, stack_x[m])
                    )
                    stack_v = stack_v.at[m].set(
                        jnp.where(sm, v_c, stack_v[m])
                    )

                # U-turn checks: leaf i completes spans of size 2^m when
                # (i+1) % 2^m == 0 — compare with stored left endpoints
                turning = jnp.zeros((n,), bool)
                for m in range(1, j + 1):
                    check = jnp.bitwise_and(i + 1, 2**m - 1) == 0
                    dx = x_c - stack_x[m]
                    t_m = (_dot(dx, vel(stack_v[m])) < 0.0) | (
                        _dot(dx, vel(v_c)) < 0.0
                    )
                    turning = turning | (check & t_m)
                sub_stop = sub_stop | div_now | (active & turning)

                return (i + 1, x_c, v_c, g_c, stack_x, stack_v, sub_stop,
                        sub_div, log_w_sub, xp_sub, up_sub, gp_sub, sa, na,
                        nl)

            def leaf_cond(carry):
                i, sub_stop = carry[0], carry[6]
                return (i < 2**j) & jnp.any((~done) & (~sub_stop))

            z = jnp.zeros((n,), jnp.float32)
            carry = (
                jnp.int32(0), x_c, v_c, g_c, stack_x, stack_v,
                jnp.zeros((n,), bool), jnp.zeros((n,), bool),
                jnp.full((n,), -jnp.inf, jnp.float32),
                x_c, z, g_c, z, z, jnp.zeros((n,), jnp.int32),
            )
            carry = lax.while_loop(leaf_cond, leaf_body, carry)
            (_, x_c, v_c, g_c, stack_x, stack_v, sub_stop, sub_div,
             log_w_sub, xp_sub, up_sub, gp_sub, sa, na, nl) = carry

            sum_alpha = sum_alpha + sa
            n_alpha = n_alpha + na
            n_leaves = n_leaves + nl
            diverged = diverged | sub_div

            ok = (~done) & (~sub_stop)  # subtree completed cleanly
            okm = ok[None, :]

            # biased progressive merge of the subtree proposal into the tree
            lu = jnp.log(jax.random.uniform(k_merge, (n,)))
            merge = ok & (lu < (log_w_sub - log_w_tree))
            mm = merge[None, :]
            x_prop = jnp.where(mm, xp_sub, x_prop)
            u_prop = jnp.where(merge, up_sub, u_prop)
            g_prop = jnp.where(mm, gp_sub, g_prop)
            log_w_tree = jnp.where(
                ok, jnp.logaddexp(log_w_tree, log_w_sub), log_w_tree
            )

            # extend tree endpoints (back to trajectory frame)
            x_plus = jnp.where(okm & gr, x_c, x_plus)
            v_plus = jnp.where(okm & gr, v_c, v_plus)
            g_plus = jnp.where(okm & gr, g_c, g_plus)
            x_minus = jnp.where(okm & ~gr, x_c, x_minus)
            v_minus = jnp.where(okm & ~gr, -v_c, v_minus)
            g_minus = jnp.where(okm & ~gr, g_c, g_minus)

            depth_reached = jnp.where(ok, jnp.int32(j + 1), depth_reached)

            # overall U-turn between tree endpoints (trajectory frame)
            dx = x_plus - x_minus
            global_turn = (_dot(dx, vel(v_minus)) < 0.0) | (
                _dot(dx, vel(v_plus)) < 0.0
            )
            done = done | sub_stop | (ok & global_turn)

            return (key, x_minus, v_minus, g_minus, x_plus, v_plus, g_plus,
                    x_prop, u_prop, g_prop, log_w_tree, done, diverged,
                    depth_reached, n_leaves, sum_alpha, n_alpha)

        return subtree

    branches = [make_subtree(j) for j in range(max_depth)]

    def round_body(carry):
        jj, rc = carry
        return jj + 1, lax.switch(jj, branches, rc)

    def round_cond(carry):
        jj, rc = carry
        done = rc[11]
        return (jj < max_depth) & ~jnp.all(done)

    z = jnp.zeros((n,), jnp.float32)
    rc0 = (
        k_tree,
        state.x, v0, state.grad,  # minus endpoint (trajectory frame)
        state.x, v0, state.grad,  # plus endpoint
        state.x, state.u, state.grad,  # proposal (root)
        z,  # log weight of root = H0 − H0
        jnp.zeros((n,), bool), jnp.zeros((n,), bool),
        jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32), z, z,
    )
    _, rc = lax.while_loop(round_cond, round_body, (jnp.int32(0), rc0))
    (_, _, _, _, _, _, _, x_prop, u_prop, g_prop, _, _, diverged,
     depth_reached, n_leaves, sum_alpha, n_alpha) = rc

    new_state = NUTSState(
        x=x_prop,
        u=u_prop,
        grad=g_prop,
        grad_evals=state.grad_evals + n_leaves,
    )
    out = NUTSStepOut(
        x=x_prop,
        depth=depth_reached,
        accept_stat=sum_alpha / jnp.maximum(n_alpha, 1.0),
        diverged=diverged,
        n_leaves=n_leaves,
    )
    return new_state, out


def nuts_run(
    dist: Distribution,
    state: NUTSState,
    key: Array,
    num_steps: int,
    epsilon: Array | float,
    max_depth: int = 8,
    inv_mass: Array | None = None,
) -> Tuple[NUTSState, dict]:
    keys = jax.random.split(key, num_steps)

    def body(carry, k):
        s, o = nuts_step(dist, carry, k, epsilon, max_depth, inv_mass=inv_mass)
        ev = jnp.mean(s.grad_evals.astype(jnp.float32))
        return s, (o.x, o.depth, o.accept_stat, o.diverged, ev)

    state, (xs, depth, acc, div, ev) = lax.scan(body, state, keys)
    return state, {
        "x": xs, "depth": depth, "accept_stat": acc, "diverged": div,
        "evals_mean": ev,
    }


def sharded_nuts_run(
    mesh,
    dist: Distribution,
    state: NUTSState,
    key: Array,
    num_steps: int,
    epsilon: Array | float,
    max_depth: int = 8,
    inv_mass: Array | None = None,
) -> Tuple[NUTSState, dict]:
    """Chain-sharded NUTS over a ``('chains',)`` mesh with **per-shard
    early exit** — the TPU-right sharding of the doubling loop.

    A naively chain-sharded ``nuts_run`` is NOT collective-free: the
    round/leaf ``while_loop`` conditions reduce ``done`` over the (sharded)
    chain axis, so GSPMD inserts one 1-bit all-reduce per doubling round
    per iteration. Wrapping the whole run in ``shard_map`` instead gives
    every device its own independent while loops: zero communication
    (pinned at the HLO level in tests/test_collectives.py), and each shard
    exits as soon as *its own* chains are done — strictly earlier than the
    global exit, so weak scaling is ≥ the single-device program. Per-device
    RNG streams derive from ``fold_in(key, axis_index)``.

    The returned dict carries ``evals_mean_shards`` of shape
    (steps, n_shards) — per-shard chain-mean counters. Averaging them
    (equal shard sizes ⇒ plain mean) is left to the caller/host so the
    compiled program contains literally zero collectives.
    """
    from jax.sharding import PartitionSpec as P

    def local(x, u, grad, grad_evals):
        dev = jax.lax.axis_index("chains")
        k = jax.random.fold_in(key, dev)
        st = NUTSState(x=x, u=u, grad=grad, grad_evals=grad_evals)
        s, outs = nuts_run(
            dist, st, k, num_steps, epsilon, max_depth, inv_mass=inv_mass
        )
        # per-shard chain-mean counter as a (T, 1) column so the device
        # axis stacks shardably (a scalar would force replication)
        ev = outs.pop("evals_mean")[:, None]
        return s.x, s.u, s.grad, s.grad_evals, outs, ev

    dvec = P(None, "chains")
    dsca = P("chains")
    tvec = P(None, None, "chains")  # (T, d, n) outputs
    tsca = P(None, "chains")  # (T, n) outputs
    x, u, g, ge, outs, ev = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(dvec, dsca, dvec, dsca),
        out_specs=(
            dvec, dsca, dvec, dsca,
            {"x": tvec, "depth": tsca, "accept_stat": tsca,
             "diverged": tsca},
            P(None, "chains"),
        ),
        # replicated-constant while-carry inits meet chain-varying body
        # outputs inside nuts_step; vma strictness would reject that
        # (same relaxation as sharded_pallas_mjhmc_run)
        check_vma=False,
    )(state.x, state.u, state.grad, state.grad_evals)
    outs["evals_mean_shards"] = ev
    return NUTSState(x=x, u=u, grad=g, grad_evals=ge), outs


@dataclasses.dataclass
class NUTS:
    """Reference-style wrapper, same shape as MarkovJumpHMC/ControlHMC."""

    distribution: Distribution
    epsilon: float = 0.5
    max_depth: int = 8
    nbatch: int = 128
    seed: int = 0
    # diagonal mass matrix M (Stan convention: pass precisions 1/variance)
    mass_diag: tuple | None = None

    def __post_init__(self):
        self._key = jax.random.key(self.seed)
        self._key, k0 = jax.random.split(self._key)
        self.state = make_nuts_state(self.distribution, k0, self.nbatch)
        inv_mass = None
        if self.mass_diag is not None:
            import numpy as _np

            inv_mass = jnp.asarray(
                1.0 / _np.asarray(self.mass_diag, _np.float32)
            )[:, None]
        self._run = jax.jit(
            lambda s, k, n_steps: nuts_run(
                self.distribution, s, k, n_steps, self.epsilon,
                self.max_depth, inv_mass,
            ),
            static_argnums=(2,),
        )

    def _next_key(self) -> Array:
        self._key, k = jax.random.split(self._key)
        return k

    def sample(self, num_steps: int) -> dict:
        self.state, outs = self._run(self.state, self._next_key(), num_steps)
        return outs

    def burn_in(self, num_steps: int = 200) -> None:
        self.state, _ = self._run(self.state, self._next_key(), num_steps)
        self.state = self.state._replace(
            grad_evals=jnp.zeros_like(self.state.grad_evals)
        )

    @property
    def grad_evals(self) -> int:
        return int(jnp.sum(self.state.grad_evals))
