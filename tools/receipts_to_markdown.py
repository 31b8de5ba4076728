"""Render the north-star receipts + winner calls as the RESULTS.md table.

Reads docs/figures/ess_receipts.json (+ ess_winners.json if present) and
prints the round-5 receipts table: one row per config, one column per
sampler, each cell ``median ±spread%`` with the tuned M and (where not
leapfrog) the integrator; the winner cell is bolded only when the
spread-aware arbitration (tools/receipts_winners.py) declared a winner,
otherwise every tied sampler is bolded and the config is marked (tie).
Pure post-processing — runs anywhere; keeps the committed prose honest
by making the table mechanically derived from the receipts.

Usage: python tools/receipts_to_markdown.py [receipts.json [winners.json]]
"""

import json
import sys

SAMPLER_COLS = (
    ("mjhmc", "MJHMC (engine)"),
    ("control", "ControlHMC (engine)"),
    ("malt", "MALT (engine)"),
    ("nuts-engine", "NUTS (engine)"),
    ("nuts", "NUTS (xla)"),
)
CONFIG_ORDER = (
    "gauss2d", "rough_well", "rough_well_a3", "product_of_t", "gauss50d",
    "sparse_coding",
)
CONFIG_LABEL = {
    "rough_well": "rough_well (ballistic)",
    "rough_well_a3": "**rough_well_a3 (barrier)**",
}


def _fmt(v):
    m, e = f"{v:.2e}".split("e")
    return f"{m}e{int(e)}"


def cell(row, bold):
    d = row["detail"]
    rep = d.get("repeats", {})
    spread = rep.get("rel_spread")
    v = _fmt(row["value"])
    if bold:
        v = f"**{v}**"
    bits = [v]
    if spread is not None:
        bits.append(f"±{100 * spread:.0f}%")
    notes = []
    if d.get("integrator") not in (None, "leapfrog"):
        notes.append(d["integrator"])
    if d["sampler"] in ("nuts", "nuts-engine"):
        notes.append(f"depth={d['num_leapfrog_steps']}")
        if d.get("lane_block"):
            notes.append(f"lb={d['lane_block']}")
    else:
        notes.append(f"M={d['num_leapfrog_steps']}")
    return " ".join(bits) + " (" + ", ".join(notes) + ")"


def render(rows, calls):
    by = {}
    for r in rows:
        by[(r["detail"]["config"], r["detail"]["sampler"])] = r
    configs = [c for c in CONFIG_ORDER if any(k[0] == c for k in by)]
    configs += sorted({k[0] for k in by} - set(configs))
    out = ["| Config | " + " | ".join(h for _, h in SAMPLER_COLS) + " |",
           "|---|" + "---|" * len(SAMPLER_COLS)]
    for config in configs:
        call = calls.get(config, {})
        top = ({call["winner"]} if call.get("winner")
               else set(call.get("tie", [])))
        label = CONFIG_LABEL.get(config, config)
        if not call.get("winner") and top:
            label += " *(tie)*"
        cells = []
        for sampler, _ in SAMPLER_COLS:
            r = by.get((config, sampler))
            cells.append(cell(r, sampler in top) if r else "—")
        out.append("| " + label + " | " + " | ".join(cells) + " |")
    return "\n".join(out)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    rpath = argv[0] if argv else "docs/figures/ess_receipts.json"
    wpath = argv[1] if len(argv) > 1 else "docs/figures/ess_winners.json"
    with open(rpath) as f:
        rows = json.load(f)
    try:
        with open(wpath) as f:
            calls = json.load(f)
    except FileNotFoundError:
        calls = {}
    print(render(rows, calls))
    return 0


if __name__ == "__main__":
    sys.exit(main())
