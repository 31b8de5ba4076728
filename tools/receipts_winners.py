"""Spread-aware winner arbitration over the north-star receipts.

VERDICT r4 item 1: the round-4 receipts declared per-config winners from
single point estimates while the harness's own regression guard showed
>25% same-protocol swings on 6 of 30 rows. The round-5 receipts
(bench_ess.py --table --tune --repeats N) carry per-row repeat values and
a relative spread; this tool turns them into DECISION-GRADE winner calls:

  a sampler wins a config only when its median clears the runner-up's
  median by more than the combined half-spreads — i.e. the two noise
  bands (median ± spread/2, the full observed repeat range) do not
  overlap. Otherwise the call is a TIE listing every sampler whose band
  reaches the top.

Reads docs/figures/ess_receipts.json, writes docs/figures/
ess_winners.json, prints a human table. Pure post-processing — runs
anywhere (tested on CPU in tests/test_receipts_tools.py).
"""

import json
import os
import sys


def _band(row):
    """(lo, hi) noise band for a row: median ± half the observed repeat
    range. Rows measured without repeats get a conservative ±25% band —
    the guard's measured same-protocol swing scale from round 4."""
    v = row["value"]
    rep = row["detail"].get("repeats")
    if rep and rep.get("n", 1) > 1:
        half = 0.5 * rep["rel_spread"] * v
    else:
        half = 0.25 * v
    return v - half, v + half


def arbitrate(rows):
    """rows (bench_ess receipt records) → per-config winner/tie calls."""
    by_config = {}
    for r in rows:
        by_config.setdefault(r["detail"]["config"], []).append(r)
    out = {}
    for config, rs in by_config.items():
        rs = sorted(rs, key=lambda r: r["value"], reverse=True)
        top = rs[0]
        top_lo, _ = _band(top)
        # every sampler whose band overlaps the top's band is "at the top"
        contenders = [r for r in rs if _band(r)[1] >= top_lo]
        call = {
            "ranking": [
                {
                    "sampler": r["detail"]["sampler"],
                    "median_ess_per_s": r["value"],
                    "rel_spread": r["detail"].get("repeats", {}).get(
                        "rel_spread"
                    ),
                    "integrator": r["detail"].get("integrator"),
                }
                for r in rs
            ],
        }
        if len(contenders) == 1 and len(rs) > 1:
            margin = top["value"] / rs[1]["value"] - 1.0
            call["winner"] = top["detail"]["sampler"]
            call["margin_over_runner_up"] = round(margin, 4)
        else:
            call["winner"] = None
            call["tie"] = [r["detail"]["sampler"] for r in contenders]
        out[config] = call
    return out


def main(argv=None):
    path = (argv or sys.argv[1:] or ["docs/figures/ess_receipts.json"])[0]
    with open(path) as f:
        rows = json.load(f)
    calls = arbitrate(rows)
    for config, call in calls.items():
        if call.get("winner"):
            verdict = (
                f"winner {call['winner']} "
                f"(+{100 * call['margin_over_runner_up']:.0f}% > noise)"
            )
        else:
            verdict = "TIE within noise: " + ", ".join(call["tie"])
        print(f"{config:16s} {verdict}")
    os.makedirs("docs/figures", exist_ok=True)
    with open("docs/figures/ess_winners.json", "w") as f:
        json.dump(calls, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
