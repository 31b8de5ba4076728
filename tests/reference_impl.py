"""Trusted NumPy reference implementation of the MJHMC spec (SURVEY.md §3.1).

Written independently of the JAX code path, deliberately naive: no cache
state machine — the backward-rung energy H(L⁻¹ζ) is recomputed from scratch
by explicit backward integration every step, and transitions are drawn with
ordinary inverse-CDF categorical sampling. Slow and obviously correct; used
as the golden behavioral oracle for the TPU path (SURVEY.md §4.6). The real
reference repo is unavailable (empty mount — SURVEY.md provenance notice),
so this fixture *is* the executable statement of reference behavior.
"""

import numpy as np


def leapfrog_np(grad_u, x, v, eps, m):
    """M leapfrog steps, batched (d, n). Returns x', v'."""
    x = x.copy()
    v = v.copy()
    for _ in range(m):
        v = v - 0.5 * eps * grad_u(x)
        x = x + eps * v
        v = v - 0.5 * eps * grad_u(x)
    return x, v


def numpy_mjhmc(
    u_fn,
    grad_u,
    x0,
    eps,
    beta,
    m,
    n_steps,
    rng,
):
    """Run the Rao-Blackwellized jump process; returns (xs, dwell, sel).

    xs: (n_steps, d, n) pre-transition states; dwell: (n_steps, n) expected
    dwell times; sel: (n_steps, n) which clock fired (0=L, 1=F, 2=R).
    """
    d, n = x0.shape
    x = x0.copy()
    v = rng.standard_normal((d, n))
    xs = np.empty((n_steps, d, n))
    dwell = np.empty((n_steps, n))
    sels = np.empty((n_steps, n), np.int8)

    for t in range(n_steps):
        h_cur = u_fn(x) + 0.5 * (v**2).sum(axis=0)
        xl, vl = leapfrog_np(grad_u, x, v, eps, m)
        h_l = u_fn(xl) + 0.5 * (vl**2).sum(axis=0)
        xb, vb = leapfrog_np(grad_u, x, -v, eps, m)
        h_b = u_fn(xb) + 0.5 * (vb**2).sum(axis=0)

        gamma_l = np.exp(-0.5 * (h_l - h_cur))
        gamma_lf = np.exp(-0.5 * (h_b - h_cur))
        gamma_f = np.maximum(0.0, gamma_lf - gamma_l)
        total = gamma_l + gamma_f + beta

        xs[t] = x
        dwell[t] = 1.0 / total

        u = rng.random(n) * total
        sel = np.where(u < gamma_l, 0, np.where(u < gamma_l + gamma_f, 1, 2))
        sels[t] = sel

        l_mask = sel == 0
        f_mask = sel == 1
        r_mask = sel == 2
        x[:, l_mask] = xl[:, l_mask]
        v[:, l_mask] = vl[:, l_mask]
        v[:, f_mask] = -v[:, f_mask]
        v[:, r_mask] = rng.standard_normal((d, int(r_mask.sum())))

    return xs, dwell, sels


def numpy_control_hmc(u_fn, grad_u, x0, eps, beta, m, n_steps, rng):
    """Control HMC (SURVEY.md §3.2): partial corruption, MH, flip on reject."""
    d, n = x0.shape
    x = x0.copy()
    v = rng.standard_normal((d, n))
    xs = np.empty((n_steps, d, n))
    for t in range(n_steps):
        v = np.sqrt(1 - beta) * v + np.sqrt(beta) * rng.standard_normal((d, n))
        h0 = u_fn(x) + 0.5 * (v**2).sum(axis=0)
        xl, vl = leapfrog_np(grad_u, x, v, eps, m)
        hl = u_fn(xl) + 0.5 * (vl**2).sum(axis=0)
        acc = rng.random(n) < np.minimum(1.0, np.exp(h0 - hl))
        x[:, acc] = xl[:, acc]
        v[:, acc] = vl[:, acc]
        v[:, ~acc] = -v[:, ~acc]
        xs[t] = x
    return xs
