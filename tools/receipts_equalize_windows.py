"""Window-equalization pass over an already-measured receipts table.

bench_ess's adaptive spread-lengthening can leave one sampler of a
config measured at a longer window than its rivals, and ESS/s is
monotone-increasing in the window (dispatch amortization + ESS
saturation) — see bench_ess._equalize_config_windows, which bakes the
per-config equalization into the table flow. This tool applies the same
pass to a receipts JSON produced before that fix (or merged from
chunked runs): rows below their config's maximum effective window are
re-measured at it, preserving tuned operating points (NUTS mass
matrices are re-derived from the deterministic warmup).

Usage (real TPU):
  python tools/receipts_equalize_windows.py [docs/figures/ess_receipts.json]
"""

import json
import sys

sys.path.insert(0, ".")


def main(argv=None):
    path = (argv or sys.argv[1:] or ["docs/figures/ess_receipts.json"])[0]

    import jax

    if jax.default_backend() != "tpu":
        print("# requires the real TPU", file=sys.stderr)
        return 1
    import jax.numpy as jnp

    float(jax.jit(lambda x: x * 2)(jnp.ones(8)).sum())

    from bench_ess import _equalize_config_windows, _tune_nuts
    from mjhmc_tpu.config import BENCHMARK_CONFIGS

    with open(path) as f:
        rows = json.load(f)

    by_config = {}
    for i, r in enumerate(rows):
        by_config.setdefault(r["detail"]["config"], []).append(i)

    for config, idxs in by_config.items():
        mass_cache = None
        entries = []
        for i in idxs:
            d = rows[i]["detail"]
            mass = None
            if d["sampler"] in ("nuts", "nuts-engine"):
                if mass_cache is None:
                    cfg = BENCHMARK_CONFIGS[config]
                    _, mass_cache = _tune_nuts(cfg.make_distribution(), cfg)
                mass = mass_cache
            entries.append((i, d["sampler"], dict(
                epsilon=d["epsilon"], beta=d["beta"],
                m=d["num_leapfrog_steps"], mass=mass,
                lane=d.get("lane_block"),
                integrator=d.get("integrator", "leapfrog"),
            )))
        _equalize_config_windows(config, entries, rows, repeats=5,
                                 spread_tol=0.20)

    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps({"equalized": sum(
        1 for r in rows if "window_equalized_to" in r["detail"]
    )}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
