"""M-axis boundary audit of the committed claim battery (VERDICT r3
item 3 / r4 item 3).

Round 3's `efficiency_claim.json` pinned several optima at the old M=20
grid ceiling; round 4 re-audited {gauss50d, rough_well[a=4],
sparse_coding} at m_grid≤50 and left exactly one row — sparse_coding
control — at the NEW top M=50 (the "upper bound" caveat).
`efficiency_claim.DEFAULT_TARGETS` now carries the sparse grid up to
100; this driver re-tunes the targets named by ``--targets`` (default:
the still-pinned sparse_coding) at the extended grid and MERGES the
re-tuned rows + recomputed ratios into the committed JSON, recording
the per-target ratio delta so RESULTS can state "M optima interior or
ratios stable within X%". (A full-battery rerun covers the same ground
at ~3× the chip time; targets with strictly interior optima are
untouched by a ceiling extension by construction.)

Usage (real TPU): python tools/claim_m_audit.py [--targets a,b]
Writes docs/figures/efficiency_claim.json (merged) and
docs/figures/efficiency_claim_m_audit.{json,png,npz} (the audit's own
rows/curves receipt).
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--targets", default="sparse_coding",
                    help="comma-separated battery targets to re-audit")
    a = ap.parse_args()

    import jax

    if jax.default_backend() != "tpu":
        print("# requires the real TPU", file=sys.stderr)
        return 1
    import jax.numpy as jnp

    float(jax.jit(lambda x: x * 2)(jnp.ones(8)).sum())  # warm compile svc

    from mjhmc_tpu.experiments.efficiency_claim import (
        DEFAULT_TARGETS,
        run_claim,
        save_figure,
    )

    pinned = {t for t in a.targets.split(",") if t}
    targets = tuple(t for t in DEFAULT_TARGETS if t[0] in pinned)
    assert {t[0] for t in targets} == pinned

    result = run_claim(targets, seed=0)

    path = "docs/figures/efficiency_claim.json"
    with open(path) as f:
        committed = json.load(f)
    old_rows = {
        (r["target"], r["sampler"]): r for r in committed["rows"]
    }
    deltas = {}
    for name, ratio in result["ratios"].items():
        old = committed["ratios"].get(name, {}).get(
            "ratio_control_over_mjhmc"
        )
        new = ratio["ratio_control_over_mjhmc"]
        deltas[name] = {
            "old_ratio": old,
            "new_ratio": new,
            "rel_change": None if not old else new / old - 1.0,
            "old_m": {
                s: old_rows.get((name, s), {}).get("num_leapfrog_steps")
                for s in ("mjhmc", "control")
            },
            "new_m": {
                r["sampler"]: r["num_leapfrog_steps"]
                for r in result["rows"]
                if r["target"] == name
            },
        }
    # merge: replace the re-audited rows/ratios in the committed record
    committed["rows"] = [
        r for r in committed["rows"] if r["target"] not in pinned
    ] + result["rows"]
    committed["ratios"].update(
        {k: v for k, v in result["ratios"].items()}
    )
    prior = committed.get("m_audit", {})
    committed["m_audit"] = {
        # per-target grid ceiling actually searched this audit
        "m_grid_max": {
            name: max(kw.get("m_grid", (50,))) for name, _, kw in targets
        },
        "re_audited_targets": sorted(pinned),
        "deltas": deltas,
        "prior_audit": {k: prior.get(k) for k in
                        ("m_grid_max", "re_audited_targets")},
    }
    with open(path, "w") as f:
        json.dump(committed, f, indent=1)

    out = "docs/figures/efficiency_claim_m_audit"
    save_figure(result, out + ".png", out + ".npz")
    with open(out + ".json", "w") as f:
        json.dump(
            {"rows": result["rows"], "ratios": result["ratios"],
             "deltas": deltas},
            f, indent=1,
        )
    print(json.dumps({"deltas": deltas}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
