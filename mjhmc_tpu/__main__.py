"""Command-line entry points.

    python -m mjhmc_tpu sample  --config rough_well --sampler mjhmc --steps 1000
    python -m mjhmc_tpu bench   [--config rough_well]
    python -m mjhmc_tpu figures [--quick] [--out figures_out]
    python -m mjhmc_tpu search  --config gauss2d
    python -m mjhmc_tpu smc     --config product_of_t
    python -m mjhmc_tpu vi      --config gauss2d

The TPU-native replacement for the reference's per-experiment scripts
(SURVEY.md §2.7/L5): the five BASELINE configs are named presets.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def cmd_sample(args):
    import jax
    from mjhmc_tpu.config import BENCHMARK_CONFIGS
    from mjhmc_tpu.diagnostics import effective_sample_size
    from mjhmc_tpu.samplers import (
        MALT,
        ControlHMC,
        MarkovJumpHMC,
        NUTS,
        ParallelTempering,
        ReducedFlipHMC,
    )

    cfg = BENCHMARK_CONFIGS[args.config]
    dist = cfg.make_distribution()

    if getattr(args, "engine", "xla") == "pallas":
        # fused-engine path (TPU): stream (x, dwell) from the kernel and
        # report the same record shape as the XLA path
        from mjhmc_tpu.ops.pallas_mjhmc import (
            PallasControlHMC,
            PallasMALT,
            PallasMJHMC,
            PallasNUTS,
        )

        try:
            ecls = {
                "mjhmc": PallasMJHMC,
                "control": PallasControlHMC,
                "malt": PallasMALT,
                "nuts": PallasNUTS,
            }[args.sampler]
        except KeyError:
            raise SystemExit(
                f"--engine pallas supports mjhmc/control/malt/nuts, "
                f"not {args.sampler!r}"
            )
        beta = args.gamma if args.sampler == "malt" else cfg.beta
        # the NUTS engine's num_leapfrog slot is max_depth, not M
        nlf = 8 if args.sampler == "nuts" else cfg.num_leapfrog_steps
        eng = ecls(
            dist,
            epsilon=cfg.epsilon,
            beta=beta,
            num_leapfrog_steps=nlf,
            nbatch=args.nbatch or cfg.nbatch,
            seed=args.seed,
            integrator=getattr(args, "integrator", "leapfrog"),
        )
        eng.run(args.burn)
        xs_j, ws_j = eng.sample(args.steps)
        xs, w = np.asarray(xs_j), np.asarray(ws_j)
        ww = w[:, None, :]
        mean = (ww * xs).sum(axis=(0, 2)) / ww.sum()
        var = (ww * xs**2).sum(axis=(0, 2)) / ww.sum() - mean**2
        ess = float(effective_sample_size(xs_j, ws_j))
        rec = {
            "config": args.config,
            "sampler": args.sampler,
            "engine": "pallas",
            "steps": args.steps,
            "chains": int(xs.shape[2]),
            "grad_evals": eng.grad_evals,
            "mean": mean.tolist()[:8],
            "var": var.tolist()[:8],
            "ess": ess,
            "ess_per_grad_eval": ess / max(eng.grad_evals, 1),
        }
        if args.save:
            np.savez(args.save, x=xs, dwell=w)
            rec["saved"] = args.save
        print(json.dumps(rec))
        return

    cls = {
        "mjhmc": MarkovJumpHMC,
        "control": ControlHMC,
        "reduced_flip": ReducedFlipHMC,
        "nuts": NUTS,
        "malt": MALT,
        "pt": ParallelTempering,
    }[args.sampler]
    kw = dict(nbatch=args.nbatch or cfg.nbatch, seed=args.seed)
    if args.sampler == "nuts":
        s = cls(dist, epsilon=cfg.epsilon, **kw)
    elif args.sampler == "pt":
        s = cls(
            dist,
            epsilon=cfg.epsilon,
            num_leapfrog_steps=cfg.num_leapfrog_steps,
            num_temps=args.num_temps,
            beta_min=args.beta_min,
            **kw,
        )
    elif args.sampler == "malt":
        s = cls(
            dist,
            epsilon=cfg.epsilon,
            gamma=args.gamma,
            num_leapfrog_steps=cfg.num_leapfrog_steps,
            **kw,
        )
    else:
        if args.sampler in ("mjhmc", "control"):
            kw["integrator"] = getattr(args, "integrator", "leapfrog")
        s = cls(
            dist,
            epsilon=cfg.epsilon,
            beta=cfg.beta,
            num_leapfrog_steps=cfg.num_leapfrog_steps,
            **kw,
        )
    if args.sampler == "pt" and args.adapt_ladder:
        s.adapt_ladder()
    s.burn_in(args.burn)
    out = s.sample(args.steps)
    xs = np.asarray(out["x"])
    w = np.asarray(out["dwell"]) if "dwell" in out else None
    ww = w[:, None, :] if w is not None else np.ones_like(xs[:, :1, :])
    mean = (ww * xs).sum(axis=(0, 2)) / ww.sum()
    var = (ww * xs**2).sum(axis=(0, 2)) / ww.sum() - mean**2
    import jax.numpy as jnp

    ess = float(
        effective_sample_size(jnp.asarray(xs), jnp.asarray(w) if w is not None else None)
    )
    rec = {
        "config": args.config,
        "sampler": args.sampler,
        "steps": args.steps,
        "chains": int(xs.shape[2]),
        "grad_evals": s.grad_evals,
        "mean": mean.tolist()[:8],
        "var": var.tolist()[:8],
        "ess": ess,
        "ess_per_grad_eval": ess / max(s.grad_evals, 1),
    }
    if args.sampler == "pt":
        rec["betas"] = np.asarray(s.betas).tolist()
        rec["swap_rates"] = np.asarray(s.swap_rates).tolist()
        rec["round_trip_rate"] = s.round_trip_rate
    if args.save:
        np.savez(args.save, x=xs, **({"dwell": w} if w is not None else {}))
        rec["saved"] = args.save
    print(json.dumps(rec))


def cmd_bench(args):
    import bench

    if args.profile:
        # Perfetto/XProf trace of the whole timed run (SURVEY.md §5 tracing)
        from mjhmc_tpu.utils.profiling import trace

        with trace(args.profile) as d:
            rc = bench.main()
        print(f"# trace written to {d}", file=sys.stderr)
        sys.exit(rc)
    sys.exit(bench.main())


def cmd_figures(args):
    from mjhmc_tpu.experiments import figures

    argv = ["--out", args.out] + (["--quick"] if args.quick else [])
    if args.only:
        argv += ["--only", args.only]
    figures.main(argv)


def cmd_search(args):
    from mjhmc_tpu.config import BENCHMARK_CONFIGS
    from mjhmc_tpu.search import bayes_search, grid_search

    cfg = BENCHMARK_CONFIGS[args.config]
    dist = cfg.make_distribution()
    sampler = "mjhmc" if args.sampler == "nuts" else args.sampler
    if args.method == "bayes":
        res = bayes_search(
            dist,
            sampler=sampler,
            num_iters=args.iters,
            num_steps=args.steps,
            nbatch=args.nbatch or 256,
        )
    else:
        res = grid_search(
            dist,
            sampler=sampler,
            num_steps=args.steps,
            nbatch=args.nbatch or 256,
        )
    print(json.dumps({"best": res.best, "table": res.table}))


def cmd_smc(args):
    from mjhmc_tpu.config import BENCHMARK_CONFIGS
    from mjhmc_tpu.inference import SMC

    cfg = BENCHMARK_CONFIGS[args.config]
    head = SMC(
        cfg.make_distribution(),
        num_particles=args.nbatch or 4096,
        num_stages=args.stages,
        prior_scale=args.prior_scale,
        seed=args.seed,
    )
    state, trace = head.run()
    x = np.asarray(state.x)
    print(
        json.dumps(
            {
                "config": args.config,
                "log_evidence": float(state.log_z),
                "final_lambda": float(state.lam),
                "particles": int(x.shape[1]),
                "mean": x.mean(axis=1).tolist()[:8],
                "var": x.var(axis=1).tolist()[:8],
            }
        )
    )


def cmd_diagnostics(args):
    """Compute autocorrelation / ESS / empirical spectral gap from a saved
    sample file (`sample --save out.npz`)."""
    import jax.numpy as jnp

    from mjhmc_tpu.diagnostics import (
        effective_sample_size,
        empirical_spectral_gap,
        potential_scale_reduction,
        weighted_autocorrelation,
    )

    data = np.load(args.file)
    x = jnp.asarray(data["x"])
    w = jnp.asarray(data["dwell"]) if "dwell" in data else None
    rho = np.asarray(weighted_autocorrelation(x, w, nlags=args.nlags))
    rhat = np.asarray(potential_scale_reduction(x, w))
    out = {
        "file": args.file,
        "shape": list(x.shape),
        "ess": float(effective_sample_size(x, w)),
        "spectral_gap": empirical_spectral_gap(x, w),
        "rhat_max": float(rhat.max()),
        "rhat": rhat[: min(8, len(rhat))].tolist(),
        "rho_first_lags": rho[: min(10, len(rho))].tolist(),
    }
    print(json.dumps(out))


def cmd_vi(args):
    from mjhmc_tpu.config import BENCHMARK_CONFIGS
    from mjhmc_tpu.inference import ADVI

    cfg = BENCHMARK_CONFIGS[args.config]
    head = ADVI(cfg.make_distribution(), seed=args.seed, rank=args.rank)
    params, elbos = head.fit()
    rec = {
        "config": args.config,
        "rank": args.rank,
        "final_elbo": float(np.asarray(elbos)[-50:].mean()),
        "mu": np.asarray(params.mu).tolist()[:8],
        "sigma": np.exp(np.asarray(params.omega)).tolist()[:8],
    }
    if args.rank > 0:
        cov = np.asarray(head.covariance())
        rec["cov_diag"] = np.diag(cov).tolist()[:8]
    print(json.dumps(rec))


def cmd_efficiency(args):
    from mjhmc_tpu.experiments.efficiency_claim import main as claim_main

    argv = ["--out", args.out, "--seed", str(args.seed)]
    if args.quick:
        argv.append("--quick")
    claim_main(argv)


def main(argv=None):
    p = argparse.ArgumentParser(prog="mjhmc_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--config", default="rough_well")
        sp.add_argument("--nbatch", type=int, default=None)
        sp.add_argument("--seed", type=int, default=0)

    sp = sub.add_parser("sample")
    common(sp)
    sp.add_argument("--sampler",
                    choices=["mjhmc", "control", "reduced_flip", "nuts", "malt", "pt"],
                    default="mjhmc")
    sp.add_argument("--steps", type=int, default=1000)
    sp.add_argument("--burn", type=int, default=500)
    sp.add_argument("--gamma", type=float, default=1.0,
                    help="MALT friction (only used with --sampler malt)")
    sp.add_argument("--num-temps", type=int, default=6,
                    help="temperature-ladder size (only used with --sampler pt)")
    sp.add_argument("--beta-min", type=float, default=0.05,
                    help="coldest inverse temperature (only with --sampler pt)")
    sp.add_argument("--adapt-ladder", action="store_true",
                    help="tune the PT β ladder to uniform swap rates first")
    sp.add_argument("--save", default=None, help="npz path for raw samples")
    sp.add_argument("--engine", choices=["xla", "pallas"], default="xla",
                    help="pallas = the fused single-kernel engine (TPU; "
                         "mjhmc/control/malt/nuts)")
    sp.add_argument("--integrator", choices=["leapfrog", "two_stage"],
                    default="leapfrog",
                    help="two_stage = BCSS minimal-error splitting "
                         "(2 grad evals/step, arXiv:1912.03253; mjhmc/"
                         "control on either engine)")
    sp.set_defaults(fn=cmd_sample)

    sp = sub.add_parser("bench")
    sp.add_argument(
        "--profile", default=None, metavar="DIR",
        help="write a jax.profiler (Perfetto/XProf) trace of the run to DIR",
    )
    sp.set_defaults(fn=cmd_bench)

    sp = sub.add_parser("figures")
    sp.add_argument("--out", default="figures_out")
    sp.add_argument("--quick", action="store_true")
    sp.add_argument("--only", default=None, help="render a single figure by name")
    sp.set_defaults(fn=cmd_figures)

    sp = sub.add_parser("search")
    common(sp)
    sp.add_argument("--sampler", choices=["mjhmc", "control"], default="mjhmc")
    sp.add_argument("--steps", type=int, default=800)
    sp.add_argument("--method", choices=["grid", "bayes"], default="grid",
                    help="'bayes' = in-process GP-EI (the Spearmint analogue)")
    sp.add_argument("--iters", type=int, default=14,
                    help="BO iterations after the init design (bayes only)")
    sp.set_defaults(fn=cmd_search)

    sp = sub.add_parser("smc")
    common(sp)
    sp.add_argument("--stages", type=int, default=20,
                    help="tempering stages (tight high-dim posteriors, e.g. "
                         "sparse_coding, need 60-150)")
    sp.add_argument("--prior-scale", type=float, default=3.0)
    sp.set_defaults(fn=cmd_smc)

    sp = sub.add_parser("vi")
    common(sp)
    sp.add_argument(
        "--rank", type=int, default=0,
        help="covariance rank: 0 = mean-field, ndims = full-rank",
    )
    sp.set_defaults(fn=cmd_vi)

    sp = sub.add_parser("diagnostics")
    sp.add_argument("--file", required=True, help="npz from `sample --save`")
    sp.add_argument("--nlags", type=int, default=200)
    sp.set_defaults(fn=cmd_diagnostics)

    sp = sub.add_parser(
        "efficiency",
        help="the paper's statistical-efficiency claim experiment (long)",
    )
    sp.add_argument("--out", default="figures/efficiency_claim")
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--quick", action="store_true")
    sp.set_defaults(fn=cmd_efficiency)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
