"""Effective samples/sec/chip on the rough well (BASELINE north-star metric).

BASELINE.json's metric definitions name "effective samples/sec/chip
(rough-well)" alongside raw leapfrog steps/sec (bench.py). This harness
measures it end-to-end on the fused Pallas engine's streaming path:

  1. burn in (stats-only engine run, not timed),
  2. stream T dwell-weighted samples for all chains (timed, host-forced),
  3. ESS via the dwell-weighted Geyer initial-positive-sequence estimator
     (diagnostics/autocorr.py) computed on-device over all chains.

Prints ONE JSON line like bench.py. ESS computation is diagnostics, not
sampling, and is excluded from the timed window; the JSON carries both the
sampling wall time and the ESS so the division is auditable.
"""

import argparse
import json
import sys
import time

from mjhmc_tpu.config import BENCHMARK_CONFIGS
from mjhmc_tpu.diagnostics.autocorr import effective_sample_size


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="rough_well")
    ap.add_argument("--steps", type=int, default=2000, help="streamed samples")
    ap.add_argument("--burn", type=int, default=500)
    # hyperparameter overrides — feed `python -m mjhmc_tpu search` output
    # here to measure how tuning moves the north-star ESS/s metric
    ap.add_argument("--epsilon", type=float, default=None)
    ap.add_argument("--beta", type=float, default=None)
    ap.add_argument("--num-leapfrog-steps", type=int, default=None)
    a = ap.parse_args(argv)
    num_emits, burn = a.steps, a.burn

    from mjhmc_tpu.ops.pallas_mjhmc import PallasMJHMC

    cfg = BENCHMARK_CONFIGS[a.config]
    dist = cfg.make_distribution()
    epsilon = cfg.epsilon if a.epsilon is None else a.epsilon
    beta = cfg.beta if a.beta is None else a.beta
    m = cfg.num_leapfrog_steps if a.num_leapfrog_steps is None else a.num_leapfrog_steps
    eng = PallasMJHMC(
        dist,
        epsilon=epsilon,
        beta=beta,
        num_leapfrog_steps=m,
        nbatch=cfg.nbatch,
        seed=0,
    )
    try:
        eng.run(burn)  # burn-in + engine compile
    except Exception as e:
        print(
            "# pallas engine unavailable — this benchmark requires a real "
            f"TPU ({type(e).__name__})",
            file=sys.stderr,
        )
        return 1
    # warm the streaming kernel at the SAME num_emits — it is a static
    # kernel parameter, so a different warmup size would leave the timed
    # call paying the compile
    xs, ws = eng.sample(num_emits)
    float(ws.sum())

    # best-of-trials like bench.py: the tunneled axon backend has variable
    # dispatch latency, so a single trial can misstate the headline number
    wall = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        xs, ws = eng.sample(num_emits)
        float(ws.sum())  # force host materialization (axon tunnel)
        wall = min(wall, time.perf_counter() - t0)

    ess = float(effective_sample_size(xs, ws))
    out = {
        "metric": "effective_samples_per_sec_per_chip",
        "value": ess / wall,
        "unit": "ess/s",
        "vs_baseline": None,  # reference publishes no absolute numbers
        "detail": {
            "ess_total": ess,
            "sampling_wall_s": wall,
            "steps": num_emits,
            "chains": int(cfg.nbatch),
            "raw_samples": num_emits * int(cfg.nbatch),
            "epsilon": epsilon,
            "beta": beta,
            "num_leapfrog_steps": m,
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
