"""Effective samples/sec/chip (BASELINE north-star metric).

BASELINE.json's metric definitions name "effective samples/sec/chip
(rough-well)" alongside raw leapfrog steps/sec (bench.py). This harness
measures it end-to-end:

  - ``--sampler mjhmc`` (default): the fused Pallas engine's streaming
    path (burn → timed stream of dwell-weighted samples → dwell-weighted
    Geyer ESS, computed on-device, excluded from the timed window);
  - ``--sampler control``: the fused Pallas ControlHMC engine — the
    ENGINE-CLASS baseline (same kernel plumbing, same streaming protocol),
    so the receipts compare sampler algorithms, not runtimes;
  - ``--sampler malt``: the fused Pallas MALT engine (the ``--beta`` slot
    carries the friction γ);
  - ``--sampler nuts-engine``: the fused Pallas NUTS engine
    (``--num-leapfrog-steps`` is max_depth; tuned rows get the full
    Stan-style warmup — dual-averaged ε + diagonal mass matrix — plus a
    measured (max_depth, lane_block) arbitration, VERDICT r4 item 4);
  - ``--sampler control-xla|nuts``: the XLA samplers' ``sample`` path,
    same protocol with unweighted ESS (control-xla kept for reference —
    it was round 2's handicapped baseline).

Single-run mode prints ONE JSON line like bench.py. ``--table`` sweeps
configs × samplers — with ``--tune`` each (config, sampler) pair first
gets a dense log-grid (ε, β, M) search (search/grid.py; objective = grad
evals to ρ=1/e) and is measured at its own optimum: the tuned north-star
receipts. Round-5 protocol additions (VERDICT r4 items 1-4):

  - every committed row is the MEDIAN of ``--repeats`` (default 5)
    independent full-protocol measurements (fresh seeds → fresh chains,
    fresh windows) and carries the per-repeat values + relative spread,
    so winner margins can be judged against measurement noise; the window
    auto-lengthens (doubling emits, or thin once emits hit the HBM cap)
    while the spread exceeds ``--spread-tol``;
  - the INTEGRATOR is a tuned axis for mjhmc/control: the barrier
    configs grid-tune two_stage jointly with (ε, β, M); every config
    additionally arbitrates matched-budget two_stage transforms
    (2ε, M/2 — identical evals and trajectory span) of its top leapfrog
    candidates, and each row records the winning ``integrator``;
  - the boundary audit's M ladder extends to 560 with ``max_rounds=5``
    so the round-4 ``pinned:m_hi`` rows can go interior;
  - NUTS rows arbitrate max_depth (4…12, edge-extended) and — engine
    rows — lane_block ∈ {512, 1024} by measured ESS/s.

The tuner is BOUNDARY-AUDITED (VERDICT r3 item 1): any axis whose
optimum lands on a non-physical grid edge is extended and re-searched
until every tuned coordinate is interior or sits on a physical bound;
each receipt row carries a ``boundary`` field recording the outcome.
"""

import argparse
import json
import sys
import time

import numpy as np

from mjhmc_tpu.config import BENCHMARK_CONFIGS
from mjhmc_tpu.diagnostics.autocorr import effective_sample_size

TABLE_CONFIGS = (
    "gauss2d", "rough_well", "rough_well_a3", "product_of_t", "gauss50d",
    "sparse_coding",
)

# configs whose tuned leapfrog ε is acceptance-limited by the energy-error
# ripple — the regime where the two-stage splitting's ~10× smaller error
# constant can pay for its 2 evals/step; these get the FULL joint
# (integrator, ε, β, M) grid tune (VERDICT r4 item 2). Everywhere else
# two_stage enters arbitration via matched-budget transforms only.
BARRIER_CONFIGS = ("rough_well", "rough_well_a3")


# β (or MALT's γ) floor below which the dynamics are measurement-window
# indistinguishable from the β→0 limit: at β = 2e-4 the refresh/damping
# timescale 1/β = 5000 iterations exceeds every search window used here,
# so pushing the grid further down cannot change the measured decay — the
# same argument the claim battery's boundary audit made (RESULTS.md).
_BETA_FLOOR = 2e-4
# trajectory-length ladder for the M axis (extended on demand; round 3
# capped M at 20 and 13/24 rows pinned there; round 4's top of 200 with
# max_rounds=3 still left gauss50d control/MALT at pinned:m_hi=100 —
# VERDICT r4 item 3 — so the ladder now reaches 560 and the audit gets
# five widening rounds)
_M_LADDER = (2, 5, 10, 20, 35, 50, 70, 100, 140, 200, 280, 400, 560)


def _tune(dist, sampler, cfg, steps=600, nbatch=256, nlags=150,
          max_rounds=5, integrator="leapfrog"):
    """Boundary-audited dense log-grid (ε, β, M) tune.

    Runs ``search.grid.grid_search`` and, whenever the best point lands on
    a NON-PHYSICAL grid edge (ε at either end, β at a floor above
    ``_BETA_FLOOR``, M at the ladder top), widens that axis and re-searches
    — up to ``max_rounds`` times. Physical bounds are never extended:
    β = 1.0 (full refresh) and β ≤ ``_BETA_FLOOR`` (the effective β→0
    limit). Returns ``(best_row, boundary, table)`` with boundary ∈
    {"interior", "physical", "pinned:<axes>"} — "pinned" means the audit
    ran out of rounds with an axis still on a widenable edge (reported
    honestly, never silently).
    """
    from mjhmc_tpu.search.grid import grid_search

    eps0 = cfg.epsilon
    if integrator == "two_stage":
        # matched-budget prior: 2 evals/step → the comparable step size
        # is ~2× leapfrog's, so center the (re-searched) ε window there
        eps0 = 2.0 * eps0
    eps_lo, eps_hi = eps0 / 8.0, eps0 * 8.0
    beta_lo, beta_hi = 5e-3, 1.0
    m_hi = 20
    best = None
    for _ in range(max_rounds):
        m_grid = tuple(m for m in _M_LADDER if m <= m_hi)[-6:]
        res = grid_search(
            dist,
            sampler=sampler,
            eps_grid=tuple(np.geomspace(eps_lo, eps_hi, 7)),
            beta_grid=tuple(np.geomspace(beta_lo, beta_hi, 7)),
            m_grid=m_grid,
            num_steps=steps,
            nbatch=min(nbatch, cfg.nbatch),
            nlags=nlags,
            integrator=integrator,
        )
        best = res.best
        pinned = []
        if np.isclose(best["epsilon"], eps_hi, rtol=1e-3):
            pinned.append("eps_hi")
            eps_lo, eps_hi = best["epsilon"] / 2.0, eps_hi * 4.0
        elif np.isclose(best["epsilon"], eps_lo, rtol=1e-3):
            pinned.append("eps_lo")
            eps_hi, eps_lo = best["epsilon"] * 2.0, eps_lo / 4.0
        if (
            np.isclose(best["beta"], beta_lo, rtol=1e-3)
            and beta_lo > _BETA_FLOOR * (1 + 1e-3)
        ):
            pinned.append("beta_lo")
            beta_lo = max(_BETA_FLOOR, beta_lo / 25.0)
        if (
            sampler == "malt"
            and np.isclose(best["beta"], beta_hi, rtol=1e-3)
            and beta_hi < 50.0
        ):
            # MALT's β slot is the friction γ — unlike a refresh fraction
            # it has no physical ceiling at 1; widen upward too
            pinned.append("gamma_hi")
            beta_lo, beta_hi = best["beta"] / 2.0, beta_hi * 8.0
        if best["num_leapfrog_steps"] == max(m_grid) and m_hi < _M_LADDER[-1]:
            pinned.append("m_hi")
            m_hi = next(m for m in _M_LADDER if m > m_hi * 1.9)
        if not pinned:
            break
    else:
        if pinned:
            return best, "pinned:" + ",".join(pinned), res.table
    on_physical = (
        np.isclose(best["beta"], 1.0, rtol=1e-3)
        or best["beta"] <= _BETA_FLOOR * (1 + 1e-3)
    )
    return best, ("physical" if on_physical else "interior"), res.table


def _candidates(best, table, cfg=None, k=7):
    """Regime-diverse arbitration set, by grid decay: the audited-grid
    best, the best uncensored point of each other β decade, the best
    point at each distinct M, and the config's preset operating point.

    The grid objective — gradient evals to ρ=1/e — is the claim battery's
    fairness currency, but the RECEIPT metric is wall-clock ESS/s on the
    fused engine, and once the boundary audit unclamps the grids the two
    can part ways in BOTH directions: the eval-optimal corner (tiny β,
    tiny M) spends its wall on per-iteration overhead and correlated
    emissions, while on near-iid targets the ESS estimator saturates at
    the raw-sample count and the metric instead rewards the cheapest
    emissions (small M) regardless of decay rank. The per-decade AND
    per-M bests cover both failure directions; the preset anchors the
    set. The receipts then ARBITRATE by measured ESS/s (same protocol,
    shorter window) — optimizing the metric actually being reported,
    with the grid pruning the space.
    """
    pool = [
        r for r in table
        if np.isfinite(r["decay_evals"]) and not r.get("censored", False)
    ] or list(table)
    pool = sorted(pool, key=lambda r: r["decay_evals"])

    def bkey(r):
        return int(np.floor(np.log10(max(r["beta"], 1e-12))))

    cands = [best]
    per_decade, per_m = {}, {}
    for r in pool:
        per_decade.setdefault(bkey(r), r)
        per_m.setdefault(int(r["num_leapfrog_steps"]), r)
    extras = list(per_decade.values()) + list(per_m.values())
    if cfg is not None:
        extras.append(dict(
            epsilon=float(cfg.epsilon), beta=float(cfg.beta),
            num_leapfrog_steps=int(cfg.num_leapfrog_steps),
            decay_evals=float("nan"), censored=False,
        ))
    seen = {(best["epsilon"], best["beta"], best["num_leapfrog_steps"])}
    for r in extras:
        key = (r["epsilon"], r["beta"], r["num_leapfrog_steps"])
        if key in seen:
            continue
        seen.add(key)
        cands.append(r)
        if len(cands) >= k:
            break
    return cands


def _tune_nuts(dist, cfg):
    """Stan-style NUTS warmup: dual-averaged ε AND a variance-estimated
    diagonal mass matrix (nuts_step's inv_mass support — ε-only tuning
    leaves ~an order of magnitude on ill-conditioned targets)."""
    import jax
    import numpy as _np

    from mjhmc_tpu.samplers.adaptation import nuts_full_warmup

    nbatch = min(256, cfg.nbatch)
    _, eps, inv_mass = nuts_full_warmup(
        dist, jax.random.key(11), nbatch, eps0=cfg.epsilon
    )
    mass_diag = tuple(1.0 / _np.asarray(inv_mass).ravel())
    return float(eps), mass_diag


def _window_cap(cfg, dist) -> int:
    """Emit cap keeping one (steps, d, nbatch) f32 block under ~2 GB —
    the timed loop holds two copies live (previous + new), and e.g.
    sparse_coding at 2000×128×8192 would otherwise exhaust HBM."""
    return int(2_000_000_000 // (4 * dist.ndims * cfg.nbatch))


def measure(
    config: str,
    sampler: str = "mjhmc",
    steps: int = 2000,
    burn: int = 500,
    epsilon=None,
    beta=None,
    m=None,
    trials: int = 3,
    mass_diag=None,
    lane_block=None,
    integrator: str = "leapfrog",
    seed: int = 0,
    thin: int = 1,
) -> dict:
    """ESS/sec/chip for one (config, sampler) at the given operating point.

    ``seed`` gives an independent realization (fresh chains AND a fresh
    sampling window); ``thin`` lengthens the physical window without
    lengthening the emitted block (engine paths only) — both serve the
    repeats protocol (``measure_repeats``).
    """
    import jax.numpy as jnp

    cfg = BENCHMARK_CONFIGS[config]
    dist = cfg.make_distribution()
    epsilon = cfg.epsilon if epsilon is None else epsilon
    beta = cfg.beta if beta is None else beta
    if sampler in ("nuts", "nuts-engine"):
        m = 8 if m is None else m  # max_depth (an explicit override wins)
    else:
        m = cfg.num_leapfrog_steps if m is None else m

    steps = max(100, min(steps, _window_cap(cfg, dist)))

    engine_class = (
        "pallas"
        if sampler in ("mjhmc", "control", "malt", "nuts-engine")
        else "xla"
    )
    if engine_class == "pallas":
        from mjhmc_tpu.ops.pallas_mjhmc import (
            PallasControlHMC, PallasMALT, PallasMJHMC, PallasNUTS,
        )

        # for the MALT engine the beta slot carries the friction gamma;
        # for the NUTS engine num_leapfrog is max_depth and beta is unused
        cls = {"mjhmc": PallasMJHMC, "control": PallasControlHMC,
               "malt": PallasMALT, "nuts-engine": PallasNUTS}[sampler]
        kw = {}
        if sampler in ("mjhmc", "control"):
            kw["integrator"] = integrator
        if sampler == "nuts-engine":
            beta = 0.0  # unused scalar slot
            if mass_diag is not None:
                kw["inv_mass"] = tuple(
                    1.0 / np.asarray(mass_diag, np.float64)
                )
        # deep-M / wide-d points can overflow the 16 MB scoped-VMEM
        # kernel frame by a hair (seen: gauss50d stream at 16.11 M);
        # halving the lane block splits the grid and is the honest
        # achievable rate under the constraint — retry, never crash a
        # 2-hour table run on one candidate. CAUTION: through the axon
        # remote-compile tunnel the VMEM OOM surfaces as an opaque
        # "remote_compile: HTTP 500" JaxRuntimeError (the OOM detail only
        # reaches the service log), so compile-service failures are
        # treated as retryable too — a non-VMEM compile bug fails every
        # ladder rung and still raises at the last try.
        tries = [lane_block] + [
            lb for lb in (512, 256, 128)
            if lane_block is None or lb < lane_block
        ]
        retryable = ("vmem", "out of memory", "remote_compile",
                     "tpu_compile_helper")
        for lb_try in tries:
            try:
                kw_lb = dict(kw)
                if lb_try is not None:
                    kw_lb["lane_block"] = int(lb_try)
                eng = cls(
                    dist, epsilon=epsilon, beta=beta,
                    num_leapfrog_steps=m, nbatch=cfg.nbatch, seed=seed,
                    **kw_lb,
                )
                eng.run(burn)  # burn-in + engine compile
                # warm the streaming kernel at the SAME num_emits — it is
                # a static kernel parameter, so a different warmup size
                # would leave the timed call paying the compile
                xs, ws = eng.sample(steps, thin=thin)
                float(ws.sum())
                if lb_try is not None and lb_try != lane_block:
                    lane_block = lb_try  # record the lane actually run
                break
            except Exception as e:
                msg = str(e).lower()
                if (not any(s in msg for s in retryable)
                        or lb_try == tries[-1]):
                    raise
                print(f"# lane_block {lb_try or 'default'} failed "
                      f"({type(e).__name__}); retrying smaller",
                      file=sys.stderr, flush=True)
                # a genuine VMEM OOM crashes the remote compile helper,
                # which then 500s immediately-following compiles — give
                # the service its recovery window or every smaller rung
                # fails spuriously (observed: 512 OOM → 256/128 500 in
                # seconds, while a fresh process compiled 256 fine)
                time.sleep(20.0)
        wall = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            xs, ws = eng.sample(steps, thin=thin)
            float(ws.sum())  # force host materialization (axon tunnel)
            wall = min(wall, time.perf_counter() - t0)
        ess = float(effective_sample_size(xs, ws))
        chains = eng.nbatch
    elif sampler in ("control-xla", "nuts"):
        from mjhmc_tpu.samplers import ControlHMC, NUTS

        if sampler == "control-xla":
            s = ControlHMC(
                dist, epsilon=epsilon, beta=beta, num_leapfrog_steps=m,
                nbatch=cfg.nbatch, seed=seed, integrator=integrator,
            )
        else:
            s = NUTS(
                dist, epsilon=epsilon, nbatch=cfg.nbatch, seed=seed,
                mass_diag=mass_diag, max_depth=m,
            )
        s.burn_in(burn)
        out = s.sample(steps)
        float(jnp.sum(out["x"]))
        wall = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            out = s.sample(steps)
            float(jnp.sum(out["x"]))
            wall = min(wall, time.perf_counter() - t0)
        ess = float(effective_sample_size(out["x"]))
        chains = cfg.nbatch
        if sampler == "nuts":  # tree-depth histogram (receipt detail)
            d = np.asarray(out["depth"]).ravel()
            depth_hist = {
                int(k): int(v) for k, v in zip(*np.unique(d, return_counts=True))
            }
    else:
        raise ValueError(sampler)

    extra = {}
    if lane_block is not None:
        extra["lane_block"] = int(lane_block)
    if sampler in ("mjhmc", "control", "control-xla"):
        extra["integrator"] = integrator
    if thin != 1:
        extra["thin"] = int(thin)
    if sampler == "nuts":
        extra["depth_hist"] = depth_hist
        if mass_diag is not None:
            extra["mass_matrix"] = "diagonal (warmup-estimated)"
    return {
        "metric": "effective_samples_per_sec_per_chip",
        "value": ess / wall,
        "unit": "ess/s",
        "vs_baseline": None,  # reference publishes no absolute numbers
        "detail": {
            "config": config,
            "sampler": sampler,
            "engine": engine_class,
            "ess_total": ess,
            "sampling_wall_s": wall,
            "steps": steps,
            "chains": int(chains),
            "raw_samples": steps * int(chains),
            "epsilon": float(epsilon),
            "beta": float(beta),
            "num_leapfrog_steps": int(m),
            **extra,
        },
    }


def measure_repeats(
    config, sampler, steps=2000, burn=500, epsilon=None, beta=None, m=None,
    repeats=5, spread_tol=0.20, mass_diag=None, lane_block=None,
    integrator="leapfrog", trials=2, max_doublings=2, thin=1,
):
    """Repeats protocol (VERDICT r4 item 1): ``repeats`` independent
    full-protocol measurements (fresh seed → fresh chains, fresh window),
    reported as the MEDIAN with the per-repeat values and relative spread
    ((max−min)/median) in the receipt. While the spread exceeds
    ``spread_tol`` the window is lengthened — emits double until the HBM
    cap, then ``thin`` doubles (engine paths) — up to ``max_doublings``
    times or until a single window costs >20 s wall. Every committed
    winner margin can then be judged against the measured noise band.
    """
    cfg = BENCHMARK_CONFIGS[config]
    cap = _window_cap(cfg, cfg.make_distribution())
    lengthened = 0
    for attempt in range(max_doublings + 1):
        vals, recs = [], []
        for r in range(repeats):
            try:
                rec = measure(
                    config, sampler, steps, burn, epsilon, beta, m,
                    trials=trials, mass_diag=mass_diag,
                    lane_block=lane_block, integrator=integrator, seed=r,
                    thin=thin,
                )
            except Exception as e:
                # the axon remote-compile service intermittently 500s
                # (observed after a VMEM-OOM crash of its helper); one
                # backoff retry of the same repeat, then give up for real
                print(f"# repeat {r} failed ({type(e).__name__}); "
                      "retrying once after 30 s", file=sys.stderr,
                      flush=True)
                time.sleep(30.0)
                rec = measure(
                    config, sampler, steps, burn, epsilon, beta, m,
                    trials=trials, mass_diag=mass_diag,
                    lane_block=lane_block, integrator=integrator, seed=r,
                    thin=thin,
                )
            vals.append(rec["value"])
            recs.append(rec)
        med = float(np.median(vals))
        spread = (max(vals) - min(vals)) / max(med, 1e-30)
        wall = float(np.median(
            [r["detail"]["sampling_wall_s"] for r in recs]
        ))
        if spread <= spread_tol or attempt == max_doublings or wall > 20.0:
            break
        if steps * 2 <= cap:
            steps *= 2
        elif sampler in ("mjhmc", "control", "malt", "nuts-engine"):
            thin *= 2  # longer physical window, same emitted block
        else:
            break  # XLA path at its cap — report the spread honestly
        lengthened += 1
    # carry the repeat whose value is closest to the median as the
    # representative record (its detail fields describe a real run)
    rec = recs[int(np.argmin([abs(v - med) for v in vals]))]
    rec["value"] = med
    rec["detail"]["repeats"] = {
        "n": len(vals),
        "values": [float(f"{v:.6g}") for v in vals],
        "rel_spread": round(spread, 4),
        "window_steps": int(steps),
        "thin": int(thin),
        "lengthened": int(lengthened),
    }
    return rec


def _equalize_config_windows(config, entries, rows, repeats, spread_tol):
    """Per-config window equalization (fairness for the winner call).

    ESS/s is monotone-increasing in the measurement window for EVERY row:
    the ~52 ms dispatch amortizes, and where the ESS estimator saturates
    at the raw count the value keeps scaling with emitted samples. The
    adaptive spread-lengthening (measure_repeats) therefore must not
    leave one sampler measured at a 4× longer window than its rivals —
    after all of a config's rows are measured, any row whose effective
    window (steps × thin) is below the config's maximum is re-measured
    at that maximum (emits capped by HBM, thin making up the rest), so
    within a config every committed value shares one window.
    """
    effs = {}
    for i, sampler, _ in entries:
        rep = rows[i]["detail"]["repeats"]
        effs[i] = rep["window_steps"] * rep["thin"]
    if not effs or len(set(effs.values())) <= 1:
        return
    target = max(effs.values())
    cfg = BENCHMARK_CONFIGS[config]
    cap = _window_cap(cfg, cfg.make_distribution())
    for i, sampler, p in entries:
        if effs[i] >= target:
            continue
        steps = min(target, cap)
        thin = -(-target // steps)  # ceil
        if sampler in ("nuts", "control-xla") and thin > 1:
            # XLA paths have no thin — cap at the HBM-bounded emit count
            thin = 1
        old = rows[i]
        rec = measure_repeats(
            config, sampler, steps, 500, p["epsilon"], p["beta"], p["m"],
            repeats=repeats, spread_tol=spread_tol,
            mass_diag=p["mass"], lane_block=p["lane"],
            integrator=p["integrator"], max_doublings=0, thin=thin,
        )
        for k in ("tuned", "boundary", "arbitration", "depth_lane_rates"):
            if k in old["detail"]:
                rec["detail"][k] = old["detail"][k]
        rec["detail"]["window_equalized_to"] = int(target)
        rec["detail"]["pre_equalization_value"] = old["value"]
        rows[i] = rec
        print(json.dumps(rec), flush=True)


def _arbitrate_sampler(config, sampler, cfg, a):
    """Tune + candidate arbitration for one (config, sampler) pair under
    ``--tune``; returns (eps, beta, m, integrator, boundary, n_cands)."""
    dist = cfg.make_distribution()
    # Barrier-regime mixing is slow — give that config a 4× window so
    # slow-mixing samplers tune uncensored
    tk = (
        dict(steps=2400, nlags=600)
        if config == "rough_well_a3" else {}
    )
    best, boundary, gtable = _tune(dist, sampler, cfg, **tk)
    cands = [dict(c, integrator="leapfrog")
             for c in _candidates(best, gtable, cfg)]
    boundaries = {"leapfrog": boundary}
    if sampler in ("mjhmc", "control"):
        if config in BARRIER_CONFIGS:
            # full joint (integrator, ε, β, M) grid tune (VERDICT r4 item 2)
            best2, b2, gt2 = _tune(
                dist, sampler, cfg, integrator="two_stage", **tk
            )
            cands += [dict(c, integrator="two_stage")
                      for c in _candidates(best2, gt2, cfg, k=5)]
            boundaries["two_stage"] = b2
        else:
            # matched-budget transforms of the top leapfrog candidates:
            # 2ε with M/2 steps = identical evals AND trajectory span
            for c in list(cands[:2]):
                cands.append(dict(
                    c, integrator="two_stage",
                    epsilon=2.0 * c["epsilon"],
                    num_leapfrog_steps=max(1, c["num_leapfrog_steps"] // 2),
                ))
            boundaries["two_stage"] = "matched-budget"
    # dedup
    seen, uniq = set(), []
    for c in cands:
        key = (c["integrator"], round(c["epsilon"], 9), round(c["beta"], 9),
               c["num_leapfrog_steps"])
        if key not in seen:
            seen.add(key)
            uniq.append(c)
    cands = uniq
    # arbitrate regime-diverse grid candidates by the metric actually
    # reported — measured ESS/s on the engine (short window), then the
    # winner is re-measured at full repeats protocol by the caller
    best_rate, win = -1.0, cands[0]
    for cand in cands:
        try:
            trial = measure(
                config, sampler, max(600, a.steps // 4),
                max(200, a.burn // 2),
                cand["epsilon"], cand["beta"], cand["num_leapfrog_steps"],
                trials=1,  # ranking only; winner re-measured
                integrator=cand["integrator"],
            )
        except Exception as e:
            # a transient compile-service failure must not kill a table
            # run — an unmeasurable candidate simply cannot win
            print(f"# candidate {cand['epsilon']:.3g}/{cand['beta']:.3g}"
                  f"/{cand['num_leapfrog_steps']} skipped "
                  f"({type(e).__name__})", file=sys.stderr, flush=True)
            continue
        if trial["value"] > best_rate:
            best_rate, win = trial["value"], cand
    integ = win["integrator"]
    if win is cands[0]:
        out_boundary = boundaries["leapfrog"]
    elif boundaries.get(integ) == "matched-budget":
        out_boundary = "matched-budget:arbitrated"
    else:
        # the audit's boundary verdict belongs to each grid's best point;
        # relabel for an arbitrated winner from the candidate pool
        win_physical = (
            np.isclose(win["beta"], 1.0, rtol=1e-3)
            or win["beta"] <= _BETA_FLOOR * (1 + 1e-3)
        )
        out_boundary = (
            "physical" if win_physical else "interior"
        ) + ":arbitrated"
    tuned = not win.get("censored", False)
    return (
        win["epsilon"], win["beta"], win["num_leapfrog_steps"], integ,
        out_boundary, len(cands), tuned,
    )


def _arbitrate_nuts(config, sampler, cfg, a, eps, mass):
    """Measured (max_depth, lane_block) arbitration for the NUTS rows
    (VERDICT r4 item 4): short-window ESS/s over depth ∈ {4,6,8,10}
    (edge-extended to 12) × lane_block ∈ {512, 1024} (engine rows only —
    the XLA path has no lane blocking). Returns
    (max_depth, lane_block, boundary, rates)."""
    depth_grid = [4, 6, 8, 10]
    lane_grid = [512, 1024] if sampler == "nuts-engine" else [None]
    rates = {}

    def rate(d, lb):
        key = (d, lb)
        if key not in rates:
            try:
                trial = measure(
                    config, sampler, max(600, a.steps // 4),
                    max(200, a.burn // 2), eps, None, d,
                    trials=1, mass_diag=mass, lane_block=lb,
                )
                rates[key] = trial["value"]
            except Exception as e:
                # transient compile-service 500s (and genuine per-shape
                # VMEM walls below the ladder floor) mark the point
                # unmeasurable rather than killing the table run
                print(f"# nuts point d={d} lb={lb} skipped "
                      f"({type(e).__name__})", file=sys.stderr, flush=True)
                rates[key] = float("-inf")
        return rates[key]

    best_key = max(
        ((d, lb) for d in depth_grid for lb in lane_grid),
        key=lambda k: rate(*k),
    )
    boundary = "warmup-adapted+arbitrated"
    if best_key[0] == depth_grid[-1]:
        # depth won at the grid edge — extend once (same audit discipline
        # as the (ε, β, M) tuner; 12 is 4095 leaves, past any realized
        # tree in the committed depth histograms)
        ext = (12, best_key[1])
        if rate(*ext) > rate(*best_key):
            best_key = ext
            boundary += ":depth_hi"
    rates_out = {
        f"d{d}" + (f"/lb{lb}" if lb else ""): float(f"{v:.6g}")
        for (d, lb), v in rates.items()
    }
    return best_key[0], best_key[1], boundary, rates_out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="rough_well")
    ap.add_argument("--sampler", default="mjhmc",
                    choices=["mjhmc", "control", "malt", "nuts-engine",
                             "control-xla", "nuts"])
    ap.add_argument("--steps", type=int, default=2000, help="streamed samples")
    ap.add_argument("--burn", type=int, default=500)
    # hyperparameter overrides — feed `python -m mjhmc_tpu search` output
    # here to measure how tuning moves the north-star ESS/s metric
    ap.add_argument("--epsilon", type=float, default=None)
    ap.add_argument("--beta", type=float, default=None)
    ap.add_argument("--num-leapfrog-steps", type=int, default=None)
    ap.add_argument("--integrator", default="leapfrog",
                    choices=["leapfrog", "two_stage"])
    ap.add_argument("--repeats", type=int, default=None,
                    help="independent repeat measurements per row (median "
                         "+ spread in the receipt); default 1 single-run, "
                         "5 for --table")
    ap.add_argument("--spread-tol", type=float, default=0.20,
                    help="relative spread above which the window lengthens")
    ap.add_argument("--table", action="store_true",
                    help="sweep all BASELINE configs x samplers")
    ap.add_argument("--configs", default=None,
                    help="comma-separated subset of table configs")
    ap.add_argument("--samplers",
                    default="mjhmc,control,malt,nuts-engine,nuts",
                    help="comma-separated samplers for --table rows — the "
                         "default reproduces the full RESULTS.md receipts "
                         "table (all four engine-class families + the "
                         "XLA-path NUTS reference column)")
    ap.add_argument("--tune", action="store_true",
                    help="grid-tune (eps, beta, M [, integrator]) per pair "
                         "before measuring")
    ap.add_argument("--json-out", default=None)
    a = ap.parse_args(argv)

    try:
        if not a.table:
            repeats = 1 if a.repeats is None else a.repeats
            if repeats > 1:
                rec = measure_repeats(
                    a.config, a.sampler, a.steps, a.burn,
                    a.epsilon, a.beta, a.num_leapfrog_steps,
                    repeats=repeats, spread_tol=a.spread_tol,
                    integrator=a.integrator,
                )
            else:
                rec = measure(
                    a.config, a.sampler, a.steps, a.burn,
                    a.epsilon, a.beta, a.num_leapfrog_steps,
                    integrator=a.integrator,
                )
            print(json.dumps(rec))
            return 0

        repeats = 5 if a.repeats is None else a.repeats
        rows = []
        configs = TABLE_CONFIGS
        if a.configs:
            configs = tuple(c for c in a.configs.split(",") if c)
        for config in configs:
            cfg = BENCHMARK_CONFIGS[config]
            config_entries = []  # (row index, sampler, operating point)
            for sampler in tuple(s for s in a.samplers.split(",") if s):
                eps = beta = m = mass = lane = None
                integ = "leapfrog"
                tuned = False
                boundary = None
                extra = {}
                if a.tune and sampler in ("nuts", "nuts-engine"):
                    # NUTS warmup: ε via dual averaging + variance metric,
                    # then the measured depth/lane-block arbitration
                    eps, mass = _tune_nuts(cfg.make_distribution(), cfg)
                    m, lane, boundary, rates = _arbitrate_nuts(
                        config, sampler, cfg, a, eps, mass
                    )
                    extra["depth_lane_rates"] = rates
                    tuned = True
                elif a.tune:
                    (eps, beta, m, integ, boundary, ncands, tuned) = (
                        _arbitrate_sampler(config, sampler, cfg, a)
                    )
                    extra["arbitration"] = (
                        f"ess/s over {ncands} regime-diverse grid "
                        "candidates (x integrator)"
                    )
                rec = measure_repeats(
                    config, sampler, a.steps, a.burn, eps, beta, m,
                    repeats=repeats, spread_tol=a.spread_tol,
                    mass_diag=mass, lane_block=lane, integrator=integ,
                )
                rec["detail"]["tuned"] = tuned
                if boundary is not None:
                    rec["detail"]["boundary"] = boundary
                rec["detail"].update(extra)
                config_entries.append((len(rows), sampler, dict(
                    epsilon=eps, beta=beta, m=m, mass=mass, lane=lane,
                    integrator=integ,
                )))
                rows.append(rec)
                print(json.dumps(rec), flush=True)
            _equalize_config_windows(
                config, config_entries, rows, repeats, a.spread_tol
            )
        if a.json_out:
            with open(a.json_out, "w") as f:
                json.dump(rows, f, indent=1)
        return 0
    except Exception as e:
        import jax

        if jax.default_backend() != "tpu":
            print(
                "# pallas engine unavailable — this benchmark requires a "
                f"real TPU ({type(e).__name__})",
                file=sys.stderr,
            )
            return 1
        raise


if __name__ == "__main__":
    sys.exit(main())
