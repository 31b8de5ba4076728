"""Bayesian-optimization hyperparameter search (SURVEY.md §2.8/§3.5).

The reference drove Spearmint — an external GP/expected-improvement
service run as a separate process (`mjhmc/search/` [R]) — over
(ε, β, M) with the autocorrelation decay time as the objective. This
module is the in-process TPU-native equivalent:

- a Gaussian-process surrogate (Matérn-5/2 ARD kernel, standardized
  log-objective) whose fit + acquisition is ONE fixed-shape jitted
  program: observation buffers are padded to the full search budget and
  masked, so adding a point never recompiles;
- GP hyperparameters (lengthscales, amplitude, noise) refit each
  iteration by Adam on the masked marginal likelihood inside the same
  program (`lax.scan`);
- expected improvement maximized over a quasi-random (Halton) candidate
  set — dense enough in the ≤3-D hyperparameter space;
- the objective reuses one jitted sampler run per trajectory length M
  with (ε, β) as *traced* scalars (same trick as search.grid), so the
  entire search compiles O(len(m_grid)) sampler programs total.

Discrete M is handled Spearmint-style: relaxed to a continuous third
coordinate for the GP, snapped to the nearest allowed value for
evaluation.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.search.grid import SearchResult

Array = jax.Array

_JITTER = 1e-8


# ---------------------------------------------------------------------------
# GP surrogate (masked, fixed-shape)
# ---------------------------------------------------------------------------


def _matern52(x1: Array, x2: Array, log_ls: Array, log_amp: Array) -> Array:
    """Matérn-5/2 ARD kernel. x1:(n,d), x2:(m,d) -> (n,m)."""
    scaled1 = x1 / jnp.exp(log_ls)
    scaled2 = x2 / jnp.exp(log_ls)
    d2 = jnp.sum((scaled1[:, None, :] - scaled2[None, :, :]) ** 2, axis=-1)
    r = jnp.sqrt(jnp.maximum(d2, 1e-20))
    s5r = jnp.sqrt(5.0) * r
    return jnp.exp(2.0 * log_amp) * (1.0 + s5r + 5.0 / 3.0 * d2) * jnp.exp(-s5r)


def _masked_chol(x: Array, mask: Array, theta: Array) -> Array:
    """Cholesky of the masked kernel matrix.

    Masked-out rows/columns are replaced by identity rows: they have zero
    cross-covariance with everything and unit self-variance, so they are
    independent of (and therefore do not perturb) the posterior over the
    active points — this is what makes the fixed-shape incremental GP
    exact.
    """
    log_ls, log_amp, log_noise = theta[:-2], theta[-2], theta[-1]
    both = mask[:, None] * mask[None, :]
    k_off = _matern52(x, x, log_ls, log_amp) * both
    kmat = k_off - jnp.diag(jnp.diag(k_off)) + jnp.diag(
        mask * (jnp.exp(2.0 * log_amp) + jnp.exp(2.0 * log_noise) + _JITTER)
        + (1.0 - mask)
    )
    return jnp.linalg.cholesky(kmat)


def _gp_nll(theta: Array, x: Array, y: Array, mask: Array) -> Array:
    """Masked negative log marginal likelihood (up to a constant)."""
    chol = _masked_chol(x, mask, theta)
    ym = y * mask
    alpha = jax.scipy.linalg.cho_solve((chol, True), ym)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)) * mask)
    return 0.5 * jnp.dot(ym, alpha) + 0.5 * logdet


def _fit_theta(x: Array, y: Array, mask: Array, d: int, steps: int = 150) -> Array:
    """Adam on the masked NLL from a fixed sane init; jit-friendly scan."""
    import optax

    theta0 = jnp.concatenate(
        [jnp.zeros((d,)) + jnp.log(0.3), jnp.array([0.0, jnp.log(0.1)])]
    )
    opt = optax.adam(5e-2)

    def body(carry, _):
        theta, opt_state = carry
        g = jax.grad(_gp_nll)(theta, x, y, mask)
        updates, opt_state = opt.update(g, opt_state)
        theta = optax.apply_updates(theta, updates)
        theta = jnp.clip(theta, -6.0, 4.0)
        return (theta, opt_state), None

    (theta, _), _ = jax.lax.scan(body, (theta0, opt.init(theta0)), None, length=steps)
    return theta


def _gp_posterior(
    x: Array, y: Array, mask: Array, theta: Array, xq: Array
) -> tuple[Array, Array]:
    """Posterior mean/std at query points xq:(q,d)."""
    log_ls, log_amp = theta[:-2], theta[-2]
    chol = _masked_chol(x, mask, theta)
    alpha = jax.scipy.linalg.cho_solve((chol, True), y * mask)
    kq = _matern52(xq, x, log_ls, log_amp) * mask[None, :]
    mu = kq @ alpha
    v = jax.scipy.linalg.solve_triangular(chol, kq.T, lower=True)
    var = jnp.exp(2.0 * log_amp) - jnp.sum(v**2, axis=0)
    return mu, jnp.sqrt(jnp.maximum(var, 1e-12))


def _expected_improvement(mu: Array, sigma: Array, best: Array) -> Array:
    """EI for minimization, in standardized-y units."""
    z = (best - mu) / sigma
    phi = jnp.exp(-0.5 * z**2) / jnp.sqrt(2.0 * jnp.pi)
    cdf = 0.5 * (1.0 + jax.scipy.special.erf(z / jnp.sqrt(2.0)))
    return (best - mu) * cdf + sigma * phi


def _halton(n: int, d: int) -> np.ndarray:
    """Halton quasi-random sequence in [0,1]^d (first d primes)."""
    primes = [2, 3, 5, 7, 11, 13][:d]
    out = np.empty((n, d))
    for j, p in enumerate(primes):
        idx = np.arange(1, n + 1)
        col = np.zeros(n)
        f = 1.0 / p
        i = idx.copy()
        while i.max() > 0:
            col += f * (i % p)
            i //= p
            f /= p
        out[:, j] = col
    return out


@jax.jit
def _propose(x: Array, y: Array, mask: Array, cand: Array) -> tuple[Array, Array]:
    """One fixed-shape BO iteration: standardize y, refit θ, argmax EI."""
    n_act = jnp.maximum(jnp.sum(mask), 1.0)
    mu_y = jnp.sum(y * mask) / n_act
    sd_y = jnp.sqrt(jnp.sum(mask * (y - mu_y) ** 2) / n_act) + 1e-9
    ys = (y - mu_y) / sd_y * mask
    theta = _fit_theta(x, ys, mask, x.shape[1])
    best = jnp.min(jnp.where(mask > 0, ys, jnp.inf))
    mu, sigma = _gp_posterior(x, ys, mask, theta, cand)
    ei = _expected_improvement(mu, sigma, best)
    i = jnp.argmax(ei)
    return cand[i], ei[i]


# ---------------------------------------------------------------------------
# Generic minimizer
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class BayesResult:
    best_x: np.ndarray  # in original units
    best_y: float
    xs: np.ndarray  # (n, d) all evaluated points, original units
    ys: np.ndarray  # (n,)


def bayes_minimize(
    fn: Callable[[np.ndarray], float],
    bounds: Sequence[tuple[float, float]],
    num_init: int = 6,
    num_iters: int = 14,
    num_candidates: int = 2048,
    seed: int = 0,
) -> BayesResult:
    """Minimize ``fn`` over a box with GP-EI (the Spearmint loop, in-process).

    ``fn`` receives a point in ORIGINAL units; the GP works in [0,1]^d.
    """
    lo = np.array([b[0] for b in bounds])
    hi = np.array([b[1] for b in bounds])
    d = len(bounds)
    total = num_init + num_iters

    xs = np.zeros((total, d))
    ys = np.zeros((total,))
    mask = np.zeros((total,))

    init = _halton(num_init, d)
    rng = np.random.default_rng(seed)
    cand = np.clip(
        _halton(num_candidates, d) + rng.uniform(0, 1e-3, (num_candidates, d)),
        0.0,
        1.0,
    )
    cand_j = jnp.asarray(cand, dtype=jnp.float32)

    def eval_at(u: np.ndarray) -> float:
        v = fn(lo + u * (hi - lo))
        if not np.isfinite(v):
            finite = ys[mask > 0][np.isfinite(ys[mask > 0])]
            v = (finite.max() if len(finite) else 1.0) + 1.0
        return float(v)

    for i in range(num_init):
        xs[i] = init[i]
        ys[i] = eval_at(init[i])
        mask[i] = 1.0

    for i in range(num_init, total):
        u, _ = _propose(
            jnp.asarray(xs, jnp.float32),
            jnp.asarray(ys, jnp.float32),
            jnp.asarray(mask, jnp.float32),
            cand_j,
        )
        u = np.asarray(u, dtype=np.float64)
        xs[i] = u
        ys[i] = eval_at(u)
        mask[i] = 1.0

    i_best = int(np.argmin(ys))
    return BayesResult(
        best_x=lo + xs[i_best] * (hi - lo),
        best_y=float(ys[i_best]),
        xs=lo + xs * (hi - lo),
        ys=ys.copy(),
    )


# ---------------------------------------------------------------------------
# Sampler-hyperparameter objective (ε, β, M)
# ---------------------------------------------------------------------------


def bayes_search(
    dist,
    sampler: str = "mjhmc",
    eps_range: tuple[float, float] = (0.01, 10.0),
    beta_range: tuple[float, float] = (0.02, 0.9),
    m_grid: Sequence[int] = (5, 10, 20),
    num_init: int = 6,
    num_iters: int = 14,
    num_steps: int = 800,
    nbatch: int = 256,
    nlags: int = 100,
    seed: int = 0,
) -> SearchResult:
    """GP-EI search over (log ε, β, M); objective = grad evals to ρ=1/e.

    Drop-in upgrade of ``search.grid.grid_search`` (same SearchResult);
    the reference's Spearmint loop with the external process removed.
    """
    from mjhmc_tpu.diagnostics import weighted_autocorrelation
    from mjhmc_tpu.experiments.autocorr_experiment import _decay_time
    from mjhmc_tpu.samplers import make_hmc_state, make_mj_state
    from mjhmc_tpu.samplers.hmc import hmc_run
    from mjhmc_tpu.samplers.mjhmc import mjhmc_run

    key0 = jax.random.key(seed)
    m_grid = sorted(m_grid)
    runs = {}  # M -> (jitted (eps, beta, key) -> (rho, evals), nlags_m)

    def get_run(m: int):
        if m in runs:
            return runs[m]
        # per-M lag window: the eval axis is lag × (~M evals/step), so a
        # fixed nlags gives M=1 a window M× shorter than M=20 — and a
        # CENSORED M=1 saturates at the SMALLEST window, which a naive
        # objective would then prefer. Widen small-M windows to cover a
        # comparable eval budget (capped by the run length).
        nl = int(min(num_steps * 0.6, nlags * max(1.0, 10.0 / m)))
        if sampler == "mjhmc":
            state0 = make_mj_state(dist, key0, nbatch)

            @jax.jit
            def run(eps, beta, key, state0=state0, m=m, nl=nl):
                st, out = mjhmc_run(dist, state0, key, num_steps, eps, beta, m)
                rho = weighted_autocorrelation(out["x"], out["dwell"], nl)
                return rho, jnp.sum(st.grad_evals)

        elif sampler == "control":
            state0 = make_hmc_state(dist, key0, nbatch)

            @jax.jit
            def run(eps, beta, key, state0=state0, m=m, nl=nl):
                st, out = hmc_run(dist, state0, key, num_steps, eps, beta, m)
                rho = weighted_autocorrelation(out["x"], None, nl)
                return rho, jnp.sum(st.grad_evals)

        elif sampler == "malt":
            # the second search coordinate is MALT's friction γ (plays β's
            # refresh-rate role; same log-space box applies)
            from mjhmc_tpu.samplers.malt import malt_run

            state0 = make_hmc_state(dist, key0, nbatch)

            @jax.jit
            def run(eps, gamma, key, state0=state0, m=m, nl=nl):
                st, out = malt_run(dist, state0, key, num_steps, eps, gamma, m)
                rho = weighted_autocorrelation(out["x"], None, nl)
                return rho, jnp.sum(st.grad_evals)

        else:
            raise ValueError(sampler)
        runs[m] = (run, nl)
        return runs[m]

    table = []
    counter = [0]

    def objective(p: np.ndarray) -> float:
        log_eps, log_beta, m_rel = p
        m = m_grid[int(np.clip(round(m_rel), 0, len(m_grid) - 1))]
        eps = 10.0**log_eps
        beta = 10.0**log_beta
        run, nl = get_run(m)
        rho, evals = run(
            jnp.float32(eps),
            jnp.float32(beta),
            jax.random.fold_in(key0, counter[0]),
        )
        counter[0] += 1
        rho = np.asarray(rho)
        evals_per_step = float(evals) / (num_steps * nbatch)
        axis = np.arange(nl) * evals_per_step
        decay = _decay_time(axis, rho)
        if not np.isfinite(rho).all():
            decay = float("inf")
        censored = np.isfinite(decay) and decay >= axis[-1] * 0.999
        table.append(
            dict(
                epsilon=float(eps),
                beta=float(beta),
                num_leapfrog_steps=int(m),
                decay_evals=float(decay),
                censored=bool(censored),
            )
        )
        if censored:
            # a censored decay is only a LOWER bound at the window end;
            # penalize it past any in-window point so the GP never walks
            # toward short saturated windows (while keeping a finite,
            # window-scaled value so it still prefers longer windows)
            return float(np.log(axis[-1]) + 2.0)
        # log-scale objective: decay times span orders of magnitude
        return float(np.log(max(decay, 1e-9)))

    # β searched in log space like ε: the refresh rate spans orders of
    # magnitude and MJHMC's optima sit at LOW β (persistent L-chains) —
    # a linear axis starves that region of candidates
    bounds = [
        (np.log10(eps_range[0]), np.log10(eps_range[1])),
        (np.log10(beta_range[0]), np.log10(beta_range[1])),
        (0.0, float(len(m_grid) - 1)),
    ]
    bayes_minimize(
        objective,
        bounds,
        num_init=num_init,
        num_iters=num_iters,
        seed=seed,
    )
    # best = smallest UNCENSORED decay; fall back to censored/any only if
    # nothing resolved inside its window
    good = [
        r
        for r in table
        if np.isfinite(r["decay_evals"]) and not r.get("censored", False)
    ]
    finite = [r for r in table if np.isfinite(r["decay_evals"])]
    best = min(good or finite or table, key=lambda r: r["decay_evals"])
    return SearchResult(best=best, table=table)
