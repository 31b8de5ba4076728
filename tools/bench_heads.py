"""Performance receipts for the SMC and VI heads (VERDICT r4 item 7).

Both heads were correctness-pinned since round 2 (tests/test_inference.py:
logZ within 0.15 nats of the Gaussian oracle, ELBO within 0.1 nat of the
analytic optimum) but perf-invisible — no committed receipt showed what
accuracy costs in wall-clock on the chip. This harness measures, on the
real TPU:

  SMC — logZ-error-vs-wall on the analytic Gaussian oracle (the gauss50d
  target): anneal-length sweep, each point repeated over ``--repeats``
  seeds, reporting median wall, median |logZ error|, and stages/sec.
  Plus the config-5 (sparse_coding, 128-D) full anneal: stages/sec and
  wall-to-λ=1 at the production particle count.

  VI — ELBO-convergence-vs-wall on gauss50d (mean-field IS the target
  family: the gap to the analytic log Z̃ is exactly KL(q‖p)) and
  sparse_coding (mean-field + a rank-16 head): one fused lax.scan fit
  per row; the per-step ELBO trace + total wall give wall-to-within-
  {1.0, 0.1} nats of the converged plateau.

  Sharded path — one CPU subprocess on the forced 8-virtual-device mesh
  timing smc_run with chain-sharded particles (the adaptive-ppermute
  ring resample, parallel/collectives.py): a PATH receipt (CPU timing is
  not a TPU number and is labeled as such), pinning that the distributed
  resample actually runs inside the annealing loop.

Receipt → docs/figures/heads_receipts.json. Usage: python tools/bench_heads.py
"""

import argparse
import json
import subprocess
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def _walled(fn, trials=3):
    """Best-of-N wall with host materialization (axon tunnel discipline)."""
    out = fn()  # warm / compile
    wall = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn()
        wall = min(wall, time.perf_counter() - t0)
    return out, wall


def smc_gaussian_sweep(repeats=3):
    import jax
    import jax.numpy as jnp

    from mjhmc_tpu.config import BENCHMARK_CONFIGS
    from mjhmc_tpu.inference.smc import smc_run

    cfg = BENCHMARK_CONFIGS["gauss50d"]
    dist = cfg.make_distribution()
    prior_scale = 3.0
    var = np.asarray(dist.analytic_var(), np.float64)
    log_z_exact = 0.5 * np.sum(np.log(var)) - 0.5 * len(var) * np.log(
        prior_scale**2
    )

    rows = []
    for stages in (6, 12, 24, 48):
        fit = jax.jit(lambda k, s=stages: smc_run(
            dist, k, num_particles=4096, num_stages=s,
            prior_scale=prior_scale, num_mutation_steps=5,
            num_leapfrog_steps=5,
        ))
        errs, walls, lams = [], [], []
        for r in range(repeats):
            def run(r=r):
                state, _ = fit(jax.random.key(100 + r))
                float(state.log_z)  # force host materialization
                return state
            state, wall = _walled(run, trials=2)
            errs.append(abs(float(state.log_z) - log_z_exact))
            walls.append(wall)
            lams.append(float(state.lam))
        rows.append(dict(
            target="gauss50d", num_stages=stages, particles=4096,
            wall_s=float(np.median(walls)),
            stages_per_s=stages / float(np.median(walls)),
            logz_abs_err_nats=float(np.median(errs)),
            logz_err_values=[round(e, 4) for e in errs],
            reached_lambda1=all(l == 1.0 for l in lams),
        ))
        print(json.dumps(rows[-1]), flush=True)
    return dict(oracle_log_z=log_z_exact, sweep=rows)


def smc_config5_anneal(repeats=3):
    import jax

    from mjhmc_tpu.config import BENCHMARK_CONFIGS
    from mjhmc_tpu.inference.smc import smc_run

    cfg = BENCHMARK_CONFIGS["sparse_coding"]
    dist = cfg.make_distribution()
    stages, particles = 150, 8192
    fit = jax.jit(lambda k: smc_run(
        dist, k, num_particles=particles, num_stages=stages,
        num_mutation_steps=5, num_leapfrog_steps=5, init_eps=0.05,
    ))
    walls, lams = [], []
    for r in range(repeats):
        def run(r=r):
            state, _ = fit(jax.random.key(200 + r))
            float(state.log_z)
            return state
        state, wall = _walled(run, trials=1)
        walls.append(wall)
        lams.append(float(state.lam))
    row = dict(
        target="sparse_coding(128d)", num_stages=stages,
        particles=particles,
        wall_s=float(np.median(walls)),
        stages_per_s=stages / float(np.median(walls)),
        wall_values=[round(w, 3) for w in walls],
        reached_lambda1=all(l == 1.0 for l in lams),
        log_z=float(state.log_z),
    )
    print(json.dumps(row), flush=True)
    return row


def vi_convergence(repeats=3):
    import jax

    from mjhmc_tpu.config import BENCHMARK_CONFIGS
    from mjhmc_tpu.inference.vi import advi_fit

    rows = []
    for config, rank, steps in (
        ("gauss50d", 0, 2000),
        ("sparse_coding", 0, 2000),
        ("sparse_coding", 16, 2000),
    ):
        cfg = BENCHMARK_CONFIGS[config]
        dist = cfg.make_distribution()
        fit = jax.jit(lambda k: advi_fit(
            dist, k, num_steps=steps, n_mc=64, learning_rate=0.05,
            rank=rank,
        ))
        walls, finals, traces = [], [], []
        for r in range(repeats):
            def run(r=r):
                params, elbos = fit(jax.random.key(300 + r))
                float(elbos[-1])
                return elbos
            elbos, wall = _walled(run, trials=1)
            e = np.asarray(elbos, np.float64)
            walls.append(wall)
            finals.append(float(e[-100:].mean()))
            traces.append(e)
        wall = float(np.median(walls))
        e = traces[int(np.argsort(finals)[len(finals) // 2])]
        plateau = float(e[-100:].mean())
        # wall to reach within δ nats of the plateau (per-step wall is
        # uniform: the whole fit is one fused lax.scan)
        sec_per_step = wall / steps

        def wall_to(delta):
            # smooth the per-step MC noise before thresholding
            k = 25
            sm = np.convolve(e, np.ones(k) / k, mode="valid")
            hit = np.argmax(sm >= plateau - delta)
            if sm[hit] < plateau - delta:
                return None
            return round(float((hit + k) * sec_per_step), 4)

        row = dict(
            target=f"{config}" + (f"(rank{rank})" if rank else "(mean-field)"),
            num_steps=steps, n_mc=64,
            wall_s=wall,
            steps_per_s=steps / wall,
            elbo_final=plateau,
            elbo_final_values=[round(f, 3) for f in finals],
            wall_to_within_1nat_s=wall_to(1.0),
            wall_to_within_0p1nat_s=wall_to(0.1),
        )
        if config == "gauss50d" and rank == 0:
            # diagonal target → mean-field is the exact family: the
            # ELBO* equals log Z̃ and the residual gap is KL(q‖p)
            var = np.asarray(dist.analytic_var(), np.float64)
            log_z = 0.5 * np.sum(np.log(2 * np.pi * var))
            row["analytic_log_z"] = float(log_z)
            row["kl_gap_nats"] = float(log_z - plateau)
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


_MESH_SNIPPET = r"""
import os
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
import time, json
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from mjhmc_tpu.config import BENCHMARK_CONFIGS
from mjhmc_tpu.inference.smc import smc_run

dist = BENCHMARK_CONFIGS["gauss50d"].make_distribution()
mesh = Mesh(jax.devices(), ("chains",))
stages = 32
fit = jax.jit(lambda k: smc_run(
    dist, k, num_particles=2048, num_stages=stages, num_mutation_steps=5,
    num_leapfrog_steps=5, mesh=mesh,
))
with mesh:
    s, _ = fit(jax.random.key(5)); float(s.log_z)
    t0 = time.perf_counter()
    s, _ = fit(jax.random.key(6)); float(s.log_z)
    wall = time.perf_counter() - t0
print(json.dumps(dict(
    backend="cpu-virtual-8dev", num_stages=stages, particles=2048,
    wall_s=round(wall, 3), stages_per_s=round(stages / wall, 3),
    reached_lambda1=float(s.lam) == 1.0,
)))
"""


def sharded_path_receipt():
    out = subprocess.run(
        [sys.executable, "-c", _MESH_SNIPPET], capture_output=True,
        text=True, timeout=900,
    )
    if out.returncode != 0:
        return dict(error=out.stderr[-500:])
    line = out.stdout.strip().splitlines()[-1]
    row = json.loads(line)
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--repeats", type=int, default=3)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print("# requires the real TPU", file=sys.stderr)
        return 1
    float(jax.jit(lambda x: x * 2)(jnp.ones(8)).sum())  # warm compile svc

    receipt = {
        "smc_gaussian_logz_vs_wall": smc_gaussian_sweep(a.repeats),
        "smc_config5_anneal": smc_config5_anneal(a.repeats),
        "vi_elbo_vs_wall": vi_convergence(a.repeats),
        "smc_sharded_ring_resample_path": sharded_path_receipt(),
    }
    with open("docs/figures/heads_receipts.json", "w") as f:
        json.dump(receipt, f, indent=1)
    print("wrote docs/figures/heads_receipts.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
