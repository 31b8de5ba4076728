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
    (``--num-leapfrog-steps`` is max_depth, default 8; tuned rows get the
    full Stan-style warmup: dual-averaged ε + diagonal mass matrix);
  - ``--sampler control-xla|nuts``: the XLA samplers' ``sample`` path,
    same protocol with unweighted ESS (control-xla kept for reference —
    it was round 2's handicapped baseline).

Single-run mode prints ONE JSON line like bench.py (best-of-3 trials,
host-forced timing). ``--table`` sweeps configs × samplers — with
``--tune`` each (config, sampler) pair first gets a dense log-grid
(ε, β, M) search (search/grid.py; objective = grad evals to ρ=1/e) and is
measured at its own optimum: the tuned north-star receipts. The tuner is
BOUNDARY-AUDITED (VERDICT r3 item 1): any axis whose optimum lands on a
non-physical grid edge is extended and re-searched until every tuned
coordinate is interior or sits on a physical bound; each receipt row
carries a ``boundary`` field recording the outcome.
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


# β (or MALT's γ) floor below which the dynamics are measurement-window
# indistinguishable from the β→0 limit: at β = 2e-4 the refresh/damping
# timescale 1/β = 5000 iterations exceeds every search window used here,
# so pushing the grid further down cannot change the measured decay — the
# same argument the claim battery's boundary audit made (RESULTS.md).
_BETA_FLOOR = 2e-4
# trajectory-length ladder for the M axis (extended on demand; the round-3
# receipts capped M at 20 and 13/24 rows pinned there — VERDICT r3 weak #1)
_M_LADDER = (2, 5, 10, 20, 35, 50, 70, 100, 140, 200)


def _tune(dist, sampler, cfg, steps=600, nbatch=256, nlags=150,
          max_rounds=3):
    """Boundary-audited dense log-grid (ε, β, M) tune.

    Runs ``search.grid.grid_search`` and, whenever the best point lands on
    a NON-PHYSICAL grid edge (ε at either end, β at a floor above
    ``_BETA_FLOOR``, M at the ladder top), widens that axis and re-searches
    — up to ``max_rounds`` times. Physical bounds are never extended:
    β = 1.0 (full refresh) and β ≤ ``_BETA_FLOOR`` (the effective β→0
    limit). Returns ``(best_row, boundary)`` with boundary ∈
    {"interior", "physical", "pinned:<axes>"} — "pinned" means the audit
    ran out of rounds with an axis still on a widenable edge (reported
    honestly, never silently).
    """
    from mjhmc_tpu.search.grid import grid_search

    eps0 = cfg.epsilon
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
) -> dict:
    """ESS/sec/chip for one (config, sampler) at the given operating point."""
    import jax.numpy as jnp

    cfg = BENCHMARK_CONFIGS[config]
    dist = cfg.make_distribution()
    epsilon = cfg.epsilon if epsilon is None else epsilon
    beta = cfg.beta if beta is None else beta
    if sampler in ("nuts", "nuts-engine"):
        m = 8 if m is None else m  # max_depth (an explicit override wins)
    else:
        m = cfg.num_leapfrog_steps if m is None else m

    # cap the streamed window so one (steps, d, nbatch) f32 block stays
    # under ~2 GB — the timed loop holds two copies live (previous + new),
    # and e.g. sparse_coding at 2000×128×8192 would otherwise exhaust HBM
    cap = int(2_000_000_000 // (4 * dist.ndims * cfg.nbatch))
    steps = max(100, min(steps, cap))

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
        if lane_block is not None:
            kw["lane_block"] = int(lane_block)
        if sampler == "nuts-engine":
            beta = 0.0  # unused scalar slot
            if mass_diag is not None:
                kw["inv_mass"] = tuple(
                    1.0 / np.asarray(mass_diag, np.float64)
                )
        eng = cls(
            dist, epsilon=epsilon, beta=beta, num_leapfrog_steps=m,
            nbatch=cfg.nbatch, seed=0, **kw,
        )
        eng.run(burn)  # burn-in + engine compile
        # warm the streaming kernel at the SAME num_emits — it is a static
        # kernel parameter, so a different warmup size would leave the
        # timed call paying the compile
        xs, ws = eng.sample(steps)
        float(ws.sum())
        wall = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            xs, ws = eng.sample(steps)
            float(ws.sum())  # force host materialization (axon tunnel)
            wall = min(wall, time.perf_counter() - t0)
        ess = float(effective_sample_size(xs, ws))
        chains = eng.nbatch
    elif sampler in ("control-xla", "nuts"):
        from mjhmc_tpu.samplers import ControlHMC, NUTS

        if sampler == "control-xla":
            s = ControlHMC(
                dist, epsilon=epsilon, beta=beta, num_leapfrog_steps=m,
                nbatch=cfg.nbatch, seed=0,
            )
        else:
            s = NUTS(
                dist, epsilon=epsilon, nbatch=cfg.nbatch, seed=0,
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
                    help="grid-tune (eps, beta, M) per pair before measuring")
    ap.add_argument("--json-out", default=None)
    a = ap.parse_args(argv)

    try:
        if not a.table:
            rec = measure(
                a.config, a.sampler, a.steps, a.burn,
                a.epsilon, a.beta, a.num_leapfrog_steps,
            )
            print(json.dumps(rec))
            return 0

        rows = []
        table = TABLE_CONFIGS
        if a.configs:
            table = tuple(c for c in a.configs.split(",") if c)
        for config in table:
            cfg = BENCHMARK_CONFIGS[config]
            for sampler in tuple(s for s in a.samplers.split(",") if s):
                eps = beta = m = mass = None
                tuned = False
                boundary = None
                if a.tune and sampler in ("nuts", "nuts-engine"):
                    # NUTS warmup: ε via dual averaging + variance metric
                    eps, mass = _tune_nuts(cfg.make_distribution(), cfg)
                    tuned = True
                    boundary = "warmup-adapted"
                elif a.tune:
                    # grid-tune on the XLA path; the operating point
                    # transfers to the fused engine (same algorithm).
                    # Barrier-regime mixing is slow — give that config a
                    # 4× window so slow-mixing samplers tune uncensored
                    tk = (
                        dict(steps=2400, nlags=600)
                        if config == "rough_well_a3" else {}
                    )
                    best, boundary, table = _tune(
                        cfg.make_distribution(), sampler, cfg, **tk
                    )
                    # arbitrate regime-diverse grid candidates by the
                    # metric actually reported — measured ESS/s on the
                    # engine (short window), then re-measure the winner
                    # at full protocol below
                    cands = _candidates(best, table, cfg)
                    best_rate, win = -1.0, best
                    for cand in cands:
                        trial = measure(
                            config, sampler, max(600, a.steps // 4),
                            max(200, a.burn // 2),
                            cand["epsilon"], cand["beta"],
                            cand["num_leapfrog_steps"],
                            trials=1,  # ranking only; winner re-measured
                        )
                        if trial["value"] > best_rate:
                            best_rate, win = trial["value"], cand
                    eps, beta, m = (
                        win["epsilon"], win["beta"],
                        win["num_leapfrog_steps"],
                    )
                    tuned = not win.get("censored", False)
                    if win is not best:
                        # the audit's boundary verdict belongs to the
                        # grid best; relabel for the arbitrated winner
                        # (an interior pool point or a physical bound)
                        win_physical = (
                            np.isclose(win["beta"], 1.0, rtol=1e-3)
                            or win["beta"] <= _BETA_FLOOR * (1 + 1e-3)
                        )
                        boundary = (
                            "physical" if win_physical else "interior"
                        ) + ":arbitrated"
                rec = measure(
                    config, sampler, a.steps, a.burn, eps, beta, m,
                    mass_diag=mass,
                )
                rec["detail"]["tuned"] = tuned
                if boundary is not None:
                    rec["detail"]["boundary"] = boundary
                if a.tune and sampler not in ("nuts", "nuts-engine"):
                    rec["detail"]["arbitration"] = (
                        f"ess/s over {len(cands)} regime-diverse grid "
                        "candidates"
                    )
                rows.append(rec)
                print(json.dumps(rec), flush=True)
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
