"""On-chip throughput sweep of the matmul-engine dot precision.

Times pallas_mjhmc_mm_run (via PallasMJHMC) on sparse coding and
product-of-t at each supported precision, plus the XLA scan path for the
same config, and prints leapfrog steps/s. Receipt for the precision
default (RESULTS.md throughput table). The round-5 sweep adds the
two-pass parameter-exact 'bf16x2' split (VERDICT r4 item 6 —
_dot_bf16x2: exact contraction for a once-truncated dictionary, so the
accuracy column to watch is the dwell-weighted variance shift vs
'highest').
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mjhmc_tpu.config import BENCHMARK_CONFIGS
from mjhmc_tpu.ops.pallas_mjhmc import PallasMJHMC


def time_engine(cfg, precision, steps=2000, trials=3):
    eng = PallasMJHMC(
        cfg.make_distribution(),
        epsilon=cfg.epsilon,
        beta=cfg.beta,
        num_leapfrog_steps=cfg.num_leapfrog_steps,
        nbatch=cfg.nbatch,
        seed=0,
    )
    eng.spec = dataclasses.replace(eng.spec, precision=precision)
    out = eng.run(steps)
    float(out.w.sum())
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = eng.run(steps)
        float(out.w.sum())
        best = min(best, time.perf_counter() - t0)
    mean, var = PallasMJHMC.moments(out)
    return (
        steps * eng.nbatch * cfg.num_leapfrog_steps / best,
        [round(float(v), 5) for v in var[:4]],
    )


def main():
    assert jax.default_backend() == "tpu"
    float(jax.jit(lambda x: x * 2)(jnp.ones(8)).sum())  # warm compile svc
    results = {}
    for name in ("sparse_coding", "product_of_t"):
        cfg = BENCHMARK_CONFIGS[name]
        cfg = dataclasses.replace(cfg, nbatch=4096)
        for prec in ("highest", "bf16x3", "bf16x2", "default"):
            rate, var4 = time_engine(cfg, prec)
            results[f"{name}/{prec}"] = {
                "steps_per_sec": round(rate / 1e9, 4),
                "var_head": var4,
            }
            print(name, prec, f"{rate/1e9:.3f} B steps/s", "var:", var4,
                  flush=True)
    with open("docs/figures/mm_precision_sweep.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
