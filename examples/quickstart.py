"""Quickstart: sample the 2-D rough well with MJHMC, estimate moments,
compare against control HMC on the grad-eval fairness axis.

Runs anywhere (CPU or TPU):  python examples/quickstart.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mjhmc_tpu.models import RoughWell
from mjhmc_tpu.samplers import ControlHMC, MarkovJumpHMC
from mjhmc_tpu.experiments import calculate_autocorrelation


def main():
    dist = RoughWell(ndims=2)

    sampler = MarkovJumpHMC(
        dist, epsilon=4.0, beta=0.1, num_leapfrog_steps=10, nbatch=2048
    )
    sampler.burn_in(300)
    out = sampler.sample(1000)

    xs = np.asarray(out["x"])  # (steps, ndims, nbatch)
    w = np.asarray(out["dwell"])[:, None, :]  # Rao-Blackwell weights
    var = (w * xs**2).sum(axis=(0, 2)) / w.sum()
    print(f"dwell-weighted variance: {var}  (quadrature oracle: "
          f"{np.asarray(dist.analytic_var())})")
    print(f"algorithmic gradient evaluations: {sampler.grad_evals:,}")

    # multimodal targets: parallel tempering with a self-tuned ladder
    from mjhmc_tpu.models import GaussianMixture
    from mjhmc_tpu.samplers import ParallelTempering

    mog = GaussianMixture()  # modes at ±4, σ=0.8 — ≈12.5 kT barrier
    pt = ParallelTempering(mog, epsilon=0.4, num_leapfrog_steps=5,
                           nbatch=512, num_temps=6, beta_min=0.02)
    pt.adapt_ladder(num_windows=10, window_size=40)
    pt.burn_in(300)
    x_pt = np.asarray(pt.sample(1000)["x"])
    print(f"two-mode mixture: PT variance {x_pt.var():.2f} "
          f"(exact {float(np.asarray(mog.analytic_var())[0]):.2f}), "
          f"swap rates {np.round(pt.swap_rates, 2)}")

    for name, beta in (("mjhmc", 0.1), ("control", 0.2)):
        res = calculate_autocorrelation(
            dist, name, num_steps=800, nbatch=512, nlags=200,
            epsilon=4.0, num_leapfrog_steps=10, beta=beta,
            use_cached_init=False, burn_steps=200,
        )
        tag = " (lower bound — censored)" if res.censored else ""
        print(f"{name}: grad evals to 1/e autocorrelation ≈ "
              f"{res.decay_evals:,.0f}{tag}")


if __name__ == "__main__":
    main()
