"""NUTS-engine lane-block stall study (VERDICT r3 weak #5).

The fused NUTS engine's early exit is per-LANE-BLOCK: the round/leaf
``while_loop``s run until every chain in the block is done, so one deep
tree stalls its whole block (``_make_step_nuts``, pallas_mjhmc.py). The
cost scales with the block's depth-distribution tail: E[max over block of
realized depth] grows with block size. This harness measures the effect
directly — ESS/s and mean realized leaves/iteration at lane_block ∈
{128, 256, 512, 1024} on the two targets where trees go deep/heavy-tailed
(product_of_t, rough_well_a3), at the same warmup-tuned operating point
used by the receipts table.

Smaller blocks pay more grid steps + per-block DMA; the measurement
arbitrates the trade. Results → docs/figures/nuts_laneblock.json and a
DESIGN §5b' paragraph.

Usage (real TPU): python tools/bench_nuts_laneblock.py
"""

import json
import sys

sys.path.insert(0, ".")


def main():
    import jax

    if jax.default_backend() != "tpu":
        print("# requires the real TPU", file=sys.stderr)
        return 1
    import jax.numpy as jnp

    float(jax.jit(lambda x: x * 2)(jnp.ones(8)).sum())  # warm compile svc

    import numpy as np

    from bench_ess import _tune_nuts, measure
    from mjhmc_tpu.config import BENCHMARK_CONFIGS

    rows = []
    for config in ("product_of_t", "rough_well_a3"):
        cfg = BENCHMARK_CONFIGS[config]
        eps, mass = _tune_nuts(cfg.make_distribution(), cfg)
        for lb in (128, 256, 512, 1024):
            rec = measure(
                config, "nuts-engine", steps=600, burn=200,
                epsilon=eps, mass_diag=mass, lane_block=lb,
            )
            det = rec["detail"]
            row = dict(
                config=config,
                lane_block=lb,
                ess_per_s=rec["value"],
                ess_total=det["ess_total"],
                wall_s=det["sampling_wall_s"],
                epsilon=float(eps),
            )
            rows.append(row)
            print(json.dumps(row), flush=True)

    with open("docs/figures/nuts_laneblock.json", "w") as f:
        json.dump(rows, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
