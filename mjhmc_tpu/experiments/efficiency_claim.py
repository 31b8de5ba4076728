"""The paper's headline claim, measured in continuous state.

SURVEY.md:286 pins the reference's acceptance-level behavior: "MJHMC
reaches equal autocorrelation in ~1.5-2x fewer gradient evaluations" than
control HMC (arXiv:1509.03808 figures; exact ratios per-figure). The
ladder oracle proves the ordering matrix-exactly (tests/test_ladder.py);
this module measures it the way the paper does — on continuous-state
targets, with each sampler at its OWN search-tuned operating point
(the reference tuned per (sampler, distribution) via Spearmint,
SURVEY.md §2.8 — shared hyperparameters can bias the comparison either
way).

Protocol per (target, sampler):
  1. tune (ε, β, M) with a DENSE deterministic log-grid sweep
     (search/grid.py; ε and β are traced scalars, so each M compiles once
     and the whole grid reuses it — a ~200-point sweep is minutes on one
     chip). A ~30-eval GP search (search/bayes.py) was measured to have
     point-selection variance larger than the sampler effect under study;
     the grid removes that variance from the comparison;
  2. confirm the top-3 distinct uncensored grid points with longer,
     fresh-seeded runs (calculate_autocorrelation) and keep the best
     confirmed point — the same protocol for every sampler;
  3. report decay-evals with the censoring flag (docs/DESIGN.md §7: a
     censored decay is a lower bound, never an estimate).

The regime structure (docs/DESIGN.md §7) is part of the result: on the
smooth default rough well both samplers sit in the ballistic band and are
at parity (ladder ratio ~0.93); the paper's advantage appears as ripple
amplitude forces rejections at the achievable step size (ladder ratios
1.5-14x at 1-4 kT barriers).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Sequence

import numpy as np

from mjhmc_tpu.experiments.autocorr_experiment import (
    ACResult,
    calculate_autocorrelation,
)
from mjhmc_tpu.models.product_of_t import ProductOfT
from mjhmc_tpu.models.rough_well import RoughWell
from mjhmc_tpu.search.grid import grid_search


@dataclasses.dataclass
class ClaimRow:
    target: str
    sampler: str
    epsilon: float
    beta: float
    num_leapfrog_steps: int
    decay_evals: float
    censored: bool

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


def tuned_decay(
    dist,
    sampler: str,
    target_name: str,
    *,
    num_steps: int = 2500,
    nbatch: int = 256,
    nlags: int = 500,
    search_steps: int = 1200,
    search_nlags: int = 300,
    eps_range: tuple[float, float] = (0.05, 20.0),
    # β up to 1.0 (full refresh — control's optimum in the barrier regime
    # sits near it) and down to 2e-4: the round-2 battery tuned every MJHMC
    # rough-well row to the old 0.002 grid FLOOR, so the grid now extends a
    # decade below it (boundary audit — an optimum pinned to a grid edge is
    # unverified; the reference's Spearmint search was unclamped)
    beta_range: tuple[float, float] = (2e-4, 1.0),
    # M=1,2 matter for MJHMC: the jump process builds long trajectories by
    # L-persistence, so fine emission granularity is a legitimate optimum.
    # The top extends to 50: round 3 pinned several optima at the old M=20
    # ceiling (gauss50d, rough_well a4, sparse coding) — an M-censored
    # optimum is unverified (VERDICT r3 item 3, same boundary-audit
    # discipline as the β/ε axes above)
    m_grid: Sequence[int] = (1, 2, 5, 10, 20, 35, 50),
    n_eps: int = 8,
    n_beta: int = 9,
    seed: int = 0,
) -> tuple[ClaimRow, ACResult]:
    """Tune (ε, β, M) for ``sampler`` on ``dist``, then confirm the decay
    at the tuned point with a longer fresh-seeded run."""
    res = grid_search(
        dist,
        sampler=sampler,
        eps_grid=tuple(np.geomspace(eps_range[0], eps_range[1], n_eps)),
        beta_grid=tuple(np.geomspace(beta_range[0], beta_range[1], n_beta)),
        m_grid=tuple(m_grid),
        num_steps=search_steps,
        nbatch=nbatch,
        nlags=search_nlags,
        seed=seed,
    )
    # the short search window can mis-rank whole β regimes (tiny-β points
    # look artificially good when the window holds few refreshes — the
    # sparse-coding battery measurably tuned into a 4x-worse basin this
    # way), so the confirmation set is REGIME-DIVERSE: the best point of
    # each β decade, ranked by search decay, up to 4 candidates — then the
    # fresh-seeded full-scale confirmation arbitrates between regimes.
    # Same protocol for every sampler, so the comparison stays fair.
    pool = [
        r
        for r in res.table
        if np.isfinite(r["decay_evals"]) and not r.get("censored", False)
    ] or res.table
    pool = sorted(pool, key=lambda r: r["decay_evals"])
    by_decade = {}
    for r in pool:
        dec = int(np.floor(np.log10(max(r["beta"], 1e-12))))
        by_decade.setdefault(dec, r)  # pool is sorted: first = decade best
    cands = sorted(by_decade.values(), key=lambda r: r["decay_evals"])[:4]

    best_ac, best_row = None, None
    for r in cands:
        # the eval window is lag × (~M evals/step): widen lags (and the
        # run) for small M so the confirmation can resolve the crossing
        m_c = int(r["num_leapfrog_steps"])
        nlags_c = int(nlags * max(1.0, 10.0 / m_c))
        steps_c = max(num_steps, 2 * nlags_c)
        ac = calculate_autocorrelation(
            dist,
            sampler=sampler,
            num_steps=steps_c,
            nbatch=nbatch,
            nlags=nlags_c,
            seed=seed + 7,  # fresh stream: confirmation is not the search
            epsilon=r["epsilon"],
            beta=r["beta"],
            num_leapfrog_steps=m_c,
        )
        better = best_ac is None or (
            (not ac.censored, -ac.decay_evals)
            > (not best_ac.censored, -best_ac.decay_evals)
        )
        if better:
            best_ac, best_row = ac, r

    row = ClaimRow(
        target=target_name,
        sampler=sampler,
        epsilon=float(best_row["epsilon"]),
        beta=float(best_row["beta"]),
        num_leapfrog_steps=int(best_row["num_leapfrog_steps"]),
        decay_evals=float(best_ac.decay_evals),
        censored=bool(best_ac.censored),
    )
    return row, best_ac


def _make_sparse_coding():
    from mjhmc_tpu.models.sparse_coding import SparseCoding

    return SparseCoding()  # 128-D posterior on the pretrained Φ


def _make_gauss50d():
    from mjhmc_tpu.models.gaussian import Gaussian

    return Gaussian(ndims=50, log_conditioning=4.0)  # BASELINE config 4


# ε grid for the rough-well rows: round 2 pinned several MJHMC optima to
# the 8.5-20 band with 20 as the ceiling; extend to 60 (3× above) so the
# confirmed optimum is interior (boundary audit, VERDICT r2 item 3)
_RW_EPS = dict(eps_range=(0.05, 60.0), n_eps=9)

#: the battery: the paper's four distributions — Gaussian (50-D
#: ill-conditioned), rough well (+ the amplitude ladder), product-of-t,
#: and the 128-D sparse-coding posterior (SURVEY.md:286). Window sizes
#: chosen so confirmed decays are uncensored (amp-4 mixes ~4x slower than
#: amp-2).
DEFAULT_TARGETS = (
    (
        "gauss50d",
        _make_gauss50d,
        dict(eps_range=(0.02, 2.0), nbatch=128),
    ),
    ("rough_well[a=1]", lambda: RoughWell(2, 100.0, 4.0, amplitude=1.0), dict(**_RW_EPS)),
    ("rough_well[a=2]", lambda: RoughWell(2, 100.0, 4.0, amplitude=2.0), dict(**_RW_EPS)),
    (
        "rough_well[a=3]",
        lambda: RoughWell(2, 100.0, 4.0, amplitude=3.0),
        dict(num_steps=5000, nlags=2000, search_steps=2500, search_nlags=1000,
             **_RW_EPS),
    ),
    (
        "rough_well[a=4]",
        lambda: RoughWell(2, 100.0, 4.0, amplitude=4.0),
        dict(num_steps=9000, nlags=4000, search_steps=4000, search_nlags=2000,
             **_RW_EPS),
    ),
    (
        "product_of_t",
        lambda: ProductOfT(ndims=36, nbasis=36),
        dict(eps_range=(0.01, 3.0), nbatch=128),
    ),
    (
        "sparse_coding",
        _make_sparse_coding,
        dict(
            eps_range=(0.002, 0.5),
            nbatch=128,
            num_steps=1500,
            nlags=300,
            search_steps=800,
            search_nlags=200,
            # ladder top 100: the round-4 M audit left control pinned at
            # the then-top M=50 ("upper bound" caveat, VERDICT r4 item 3)
            m_grid=(2, 5, 10, 20, 35, 50, 70, 100),
        ),
    ),
)


def run_claim(
    targets=DEFAULT_TARGETS,
    samplers: Sequence[str] = ("mjhmc", "control"),
    seed: int = 0,
    verbose: bool = True,
) -> dict:
    """Run the full battery; returns rows + per-target eval-ratio summary.

    ``ratio`` is control-decay / mjhmc-decay: >1 means MJHMC needs fewer
    gradient evaluations to reach the same autocorrelation.
    """
    rows: list[ClaimRow] = []
    curves: dict[str, dict[str, ACResult]] = {}
    for name, make, kw in targets:
        curves[name] = {}
        for sampler in samplers:
            row, ac = tuned_decay(
                make(), sampler, name, seed=seed, **kw
            )
            rows.append(row)
            curves[name][sampler] = ac
            if verbose:
                print(json.dumps(row.to_dict()), flush=True)
    ratios = {}
    for name, _, _ in targets:
        by = {r.sampler: r for r in rows if r.target == name}
        if "mjhmc" in by and "control" in by:
            ratios[name] = {
                "ratio_control_over_mjhmc": by["control"].decay_evals
                / by["mjhmc"].decay_evals,
                "censored": by["mjhmc"].censored or by["control"].censored,
            }
    return {
        "rows": [r.to_dict() for r in rows],
        "ratios": ratios,
        "curves": curves,
    }


def save_figure(result: dict, path_png: str, path_npz: str | None = None):
    """Per-target ρ-vs-grad-evals overlay at each sampler's tuned point."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    curves = result["curves"]
    n = len(curves)
    fig, axes = plt.subplots(1, n, figsize=(4.2 * n, 3.4), squeeze=False)
    npz = {}
    for ax, (name, by_sampler) in zip(axes[0], curves.items()):
        for sampler, ac in by_sampler.items():
            label = f"{sampler} (decay={ac.decay_evals:.0f}"
            label += ", censored)" if ac.censored else ")"
            ax.plot(ac.grad_evals, ac.rho, label=label)
            npz[f"{name}/{sampler}/evals"] = ac.grad_evals
            npz[f"{name}/{sampler}/rho"] = ac.rho
        ax.axhline(np.e**-1, color="gray", lw=0.8, ls="--")
        ratio = result["ratios"].get(name, {}).get("ratio_control_over_mjhmc")
        title = name if ratio is None else f"{name}  ratio={ratio:.2f}x"
        ax.set_title(title, fontsize=10)
        ax.set_xlabel("cumulative gradient evaluations")
        ax.set_ylim(-0.1, 1.02)
        ax.legend(fontsize=7)
    axes[0][0].set_ylabel("autocorrelation")
    fig.tight_layout()
    fig.savefig(path_png, dpi=150)
    plt.close(fig)
    if path_npz:
        np.savez(path_npz, **npz)


def main(argv=None):
    import argparse
    import os

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="figures/efficiency_claim")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--quick", action="store_true", help="small smoke battery (tests)"
    )
    a = ap.parse_args(argv)
    if a.quick:
        targets = (
            (
                "rough_well[a=2]",
                lambda: RoughWell(2, 100.0, 4.0, amplitude=2.0),
                dict(
                    num_steps=400,
                    nlags=120,
                    search_steps=200,
                    search_nlags=80,
                    n_eps=3,
                    n_beta=2,
                    m_grid=(5,),
                    nbatch=64,
                ),
            ),
        )
    else:
        targets = DEFAULT_TARGETS
    result = run_claim(targets, seed=a.seed)
    os.makedirs(os.path.dirname(os.path.abspath(a.out + ".png")), exist_ok=True)
    save_figure(result, a.out + ".png", a.out + ".npz")
    record = {k: result[k] for k in ("rows", "ratios")}
    with open(a.out + ".json", "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({"ratios": result["ratios"], "out": a.out}))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
