"""ChEES trajectory-length adaptation (arXiv:2504.02627 / Hoffman et al.).

Adapts the total integration time τ of jittered HMC by ascending the
Change-in-the-Estimator-of-the-Expected-Square criterion

    ChEES = ¼ E[ (‖x' − μ‖² − ‖x − μ‖²)² ]

with a per-chain surrogate gradient: chain i runs a trajectory of
u_i·τ (u_i ~ U(0,1] jitter), realized as a **masked leapfrog** with a fixed
step budget (ops.masked_leapfrog — static shapes, frozen chains masked),
and contributes

    g_i = α_i · (‖x̂'‖² − ‖x̂‖²) · (x̂' · v'_i) · ε·round(u_i τ/ε)/τ

(α_i = MH acceptance probability, x̂ centered by the cross-chain mean —
a psum under sharding). log τ follows an Adam-normalized ascent; ε follows
dual averaging toward a target acceptance simultaneously. This is the
TPU-native replacement for hand-tuning the trajectory length M·ε
(SURVEY.md §2.9; the SMC head uses it for mutation kernels).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from mjhmc_tpu.models.base import Distribution
from mjhmc_tpu.ops.leapfrog import masked_leapfrog, total_energy
from mjhmc_tpu.samplers.adaptation import (
    DualAveragingState,
    da_init,
    da_update,
)
from mjhmc_tpu.samplers.state import HMCState

Array = jax.Array


class CheesState(NamedTuple):
    log_tau: Array  # () log total integration time
    m_adam: Array  # () Adam first moment
    v_adam: Array  # () Adam second moment
    step: Array  # () i32


def chees_init(tau0: float = 1.0) -> CheesState:
    return CheesState(
        log_tau=jnp.float32(jnp.log(tau0)),
        m_adam=jnp.float32(0.0),
        v_adam=jnp.float32(0.0),
        step=jnp.int32(0),
    )


def _adam_ascent(
    cs: CheesState, grad: Array, lr: float = 0.025
) -> CheesState:
    b1, b2, eps = 0.9, 0.999, 1e-8
    step = cs.step + 1
    m = b1 * cs.m_adam + (1 - b1) * grad
    v = b2 * cs.v_adam + (1 - b2) * grad * grad
    mhat = m / (1 - b1 ** step.astype(jnp.float32))
    vhat = v / (1 - b2 ** step.astype(jnp.float32))
    log_tau = cs.log_tau + lr * mhat / (jnp.sqrt(vhat) + eps)
    # keep τ within sane bounds
    log_tau = jnp.clip(log_tau, jnp.log(1e-3), jnp.log(1e4))
    return CheesState(log_tau=log_tau, m_adam=m, v_adam=v, step=step)


def chees_surrogate_grad(x, xl, vl, alpha, tau_i, tau):
    """Per-batch ChEES gradient estimate w.r.t. log τ (shared by the
    jittered-HMC sampler and the SMC mutation kernel). Cross-chain means
    lower to psums under sharding."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    mu_l = jnp.mean(xl, axis=-1, keepdims=True)
    xc = x - mu
    xlc = xl - mu_l
    dsq = jnp.sum(xlc * xlc, axis=-2) - jnp.sum(xc * xc, axis=-2)
    proj = jnp.sum(xlc * vl, axis=-2)
    per_chain = alpha * dsq * proj * (tau_i / tau)
    denom = jnp.maximum(jnp.sum(alpha), 1e-6)
    grad_raw = jnp.sum(per_chain) / denom
    return jnp.tanh(
        grad_raw / (jnp.abs(grad_raw) + 1e-12) * jnp.log1p(jnp.abs(grad_raw))
    )


def chees_hmc_step(
    dist: Distribution,
    state: HMCState,
    cs: CheesState,
    da: DualAveragingState,
    key: Array,
    max_leapfrog_steps: int,
    target_accept: float = 0.651,
) -> Tuple[HMCState, CheesState, DualAveragingState, dict]:
    """One jittered-HMC step + ChEES(τ) and dual-averaging(ε) updates."""
    chain = state.chain
    x, u, g = chain.x, chain.u, chain.grad
    d, n = x.shape

    eps = jnp.exp(da.log_eps)
    tau = jnp.exp(cs.log_tau)

    k_u, k_v, k_mh = jax.random.split(key, 3)
    jitter = jax.random.uniform(k_u, (n,), jnp.float32, 1e-3, 1.0)
    m_i = jnp.clip(
        jnp.round(jitter * tau / eps).astype(jnp.int32), 1, max_leapfrog_steps
    )

    v = jax.random.normal(k_v, (d, n), jnp.float32)
    h0 = total_energy(u, v)
    xl, vl, ul, gl, steps = masked_leapfrog(
        dist.potential_and_grad, x, v, g, eps, max_leapfrog_steps, m_i, u0=u
    )
    hl = total_energy(ul, vl)
    log_p = jnp.minimum(0.0, h0 - hl)
    alpha = jnp.where(jnp.isfinite(hl), jnp.exp(log_p), 0.0)
    accept = (jnp.log(jax.random.uniform(k_mh, (n,))) < log_p) & jnp.isfinite(hl)

    am = accept[None, :]
    x_new = jnp.where(am, xl, x)
    u_new = jnp.where(accept, ul, u)
    g_new = jnp.where(am, gl, g)

    # ---- ChEES surrogate gradient ----------------------------------------
    tau_i = eps * steps.astype(jnp.float32)
    grad_t = chees_surrogate_grad(x, xl, vl, alpha, tau_i, tau)

    cs = _adam_ascent(cs, grad_t)
    da = da_update(da, jnp.mean(alpha), target=target_accept)

    new_state = HMCState(
        chain=chain._replace(x=x_new, v=jnp.where(am, vl, v), u=u_new, grad=g_new),
        grad_evals=state.grad_evals + steps,
        n_accept=state.n_accept + accept.astype(jnp.int32),
    )
    out = {
        "x": x_new,
        "accept_stat": alpha,
        "tau": tau,
        "eps": eps,
        "mean_steps": jnp.mean(steps.astype(jnp.float32)),
    }
    return new_state, cs, da, out


def chees_hmc_run(
    dist: Distribution,
    state: HMCState,
    key: Array,
    num_steps: int,
    max_leapfrog_steps: int = 64,
    tau0: float = 1.0,
    eps0: float = 0.2,
    target_accept: float = 0.651,
) -> Tuple[HMCState, CheesState, DualAveragingState, dict]:
    """Warmup scan: jittered HMC with joint (τ, ε) adaptation."""
    cs = chees_init(tau0)
    da = da_init(eps0)
    keys = jax.random.split(key, num_steps)

    def body(carry, k):
        s, c, d = carry
        s, c, d, out = chees_hmc_step(
            dist, s, c, d, k, max_leapfrog_steps, target_accept
        )
        return (s, c, d), (out["tau"], out["eps"], jnp.mean(out["accept_stat"]))

    (state, cs, da), (tau_tr, eps_tr, acc_tr) = lax.scan(
        body, (state, cs, da), keys
    )
    return state, cs, da, {"tau": tau_tr, "eps": eps_tr, "accept": acc_tr}
