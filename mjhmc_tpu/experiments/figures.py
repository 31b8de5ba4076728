"""Paper-figure reproduction (SURVEY.md §2.7): autocorrelation overlays,
spectral-gap curves, 2-D trajectory fans. Artifacts dumped as npz + png.

Run:  python -m mjhmc_tpu.experiments.figures [--out figures_out] [--quick]
"""

from __future__ import annotations

import argparse
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

import jax

from mjhmc_tpu.diagnostics.spectral import (
    spectral_gap_continuous,
    spectral_gap_discrete,
)
from mjhmc_tpu.experiments.autocorr_experiment import calculate_autocorrelation
from mjhmc_tpu.models import Gaussian, ProductOfT, RoughWell, SparseCoding
from mjhmc_tpu.samplers import ControlHMC, MarkovJumpHMC
from mjhmc_tpu.samplers.algebraic import (
    continuous_rate_matrix,
    discrete_transition_matrix,
    random_ladder_energies,
    reduced_flip_transition_matrix,
)


def fig_autocorr_overlay(out_dir: str, quick: bool = False):
    """ρ vs cumulative grad evals per distribution — the paper's main
    figure, all FOUR reference distributions (SURVEY.md:121), each sampler
    at its own search-tuned operating point (the reference tuned per
    (sampler, distribution) via Spearmint; ``--quick`` keeps hand-set
    points for smoke tests)."""
    steps = 400 if quick else 3000
    nbatch = 64 if quick else 512
    # (dist, hand-set quick kwargs, search kwargs, per-dist overrides)
    dists = {
        "gaussian_2d": (
            Gaussian(ndims=2, log_conditioning=2.0),
            dict(epsilon=1.0, num_leapfrog_steps=5),
            dict(eps_range=(0.05, 10.0)),
            {},
        ),
        "rough_well": (
            RoughWell(ndims=2),
            dict(epsilon=4.0, num_leapfrog_steps=10),
            dict(eps_range=(0.1, 20.0)),
            {},
        ),
        "product_of_t": (
            ProductOfT(ndims=36, nbasis=36),
            dict(epsilon=0.12, num_leapfrog_steps=5),
            dict(eps_range=(0.01, 3.0)),
            dict(nbatch=min(nbatch, 256)),
        ),
        "sparse_coding": (
            SparseCoding(),  # 128-D posterior on the pretrained Φ
            dict(epsilon=0.02, num_leapfrog_steps=5),
            dict(eps_range=(0.002, 0.3)),
            dict(num_steps=min(steps, 1200), nbatch=min(nbatch, 256)),
        ),
    }
    hand = {
        "mjhmc": dict(beta=0.1),
        "control": dict(beta=0.2),
        "malt": dict(gamma=1.0),
    }
    fig, axes = plt.subplots(1, len(dists), figsize=(4.6 * len(dists), 4))
    artifacts = {}
    for ax, (name, (dist, quick_kw, search_kw, over)) in zip(
        np.atleast_1d(axes), dists.items()
    ):
        n_steps = over.get("num_steps", steps)
        n_batch = over.get("nbatch", nbatch)
        for sampler in ("mjhmc", "control", "malt"):
            if quick:
                kw = dict(quick_kw, **hand[sampler])
            else:
                from mjhmc_tpu.search.bayes import bayes_search

                res = bayes_search(
                    dist, sampler=sampler, num_init=8, num_iters=12,
                    num_steps=600, nbatch=128, nlags=150,
                    m_grid=(2, 5, 10, 20), **search_kw,
                )
                b = res.best
                kw = dict(
                    epsilon=b["epsilon"],
                    num_leapfrog_steps=b["num_leapfrog_steps"],
                )
                # bayes_search's 2nd coordinate is γ for MALT, β otherwise
                kw["gamma" if sampler == "malt" else "beta"] = b["beta"]
            res = calculate_autocorrelation(
                dist, sampler, num_steps=n_steps, nbatch=n_batch,
                nlags=min(200, n_steps // 4),
                use_cached_init=not quick, **kw,
            )
            label = f"{sampler} (τ={res.decay_evals:.0f}"
            label += ", censored)" if res.censored else ")"
            ax.plot(res.grad_evals, res.rho, label=label)
            artifacts[f"{name}_{sampler}_evals"] = res.grad_evals
            artifacts[f"{name}_{sampler}_rho"] = res.rho
            artifacts[f"{name}_{sampler}_params"] = np.array(
                [
                    kw["epsilon"],
                    kw.get("beta", kw.get("gamma", np.nan)),
                    kw["num_leapfrog_steps"],
                ]
            )
        ax.set_title(name)
        ax.set_xlabel("cumulative gradient evaluations")
        ax.set_ylabel("autocorrelation")
        ax.axhline(0, color="k", lw=0.5)
        ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "autocorr_overlay.png"), dpi=120)
    np.savez(os.path.join(out_dir, "autocorr_overlay.npz"), **artifacts)
    plt.close(fig)


def fig_spectral_gap(out_dir: str, quick: bool = False):
    """Spectral gap: continuous jump process vs discrete HMC, vs K and β."""
    ks = [4, 8, 16] if quick else [4, 8, 16, 32, 64]
    betas = np.linspace(0.05, 1.0, 5 if quick else 12)
    n_draws = 3 if quick else 10

    gaps_k = {"continuous": [], "reduced flip": [], "discrete": []}
    for k in ks:
        gc, gr, gd = [], [], []
        for d in range(n_draws):
            e = random_ladder_energies(jax.random.key(d), k)
            gc.append(spectral_gap_continuous(continuous_rate_matrix(e, 0.3)))
            gr.append(
                spectral_gap_discrete(reduced_flip_transition_matrix(e, 0.3))
            )
            gd.append(spectral_gap_discrete(discrete_transition_matrix(e, 0.3)))
        gaps_k["continuous"].append(np.mean(gc))
        gaps_k["reduced flip"].append(np.mean(gr))
        gaps_k["discrete"].append(np.mean(gd))

    gaps_b = {"continuous": [], "reduced flip": [], "discrete": []}
    for b in betas:
        gc, gr, gd = [], [], []
        for d in range(n_draws):
            e = random_ladder_energies(jax.random.key(100 + d), 16)
            gc.append(spectral_gap_continuous(continuous_rate_matrix(e, float(b))))
            gr.append(
                spectral_gap_discrete(reduced_flip_transition_matrix(e, float(b)))
            )
            gd.append(spectral_gap_discrete(discrete_transition_matrix(e, float(b))))
        gaps_b["continuous"].append(np.mean(gc))
        gaps_b["reduced flip"].append(np.mean(gr))
        gaps_b["discrete"].append(np.mean(gd))

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
    for name, g in gaps_k.items():
        ax1.plot(ks, g, "o-", label=name)
    ax1.set_xlabel("ladder size K")
    ax1.set_ylabel("spectral gap")
    ax1.set_xscale("log")
    ax1.legend()
    for name, g in gaps_b.items():
        ax2.plot(betas, g, "o-", label=name)
    ax2.set_xlabel("β")
    ax2.set_ylabel("spectral gap")
    ax2.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "spectral_gap.png"), dpi=120)
    np.savez(
        os.path.join(out_dir, "spectral_gap.npz"),
        ks=np.array(ks), betas=betas,
        cont_k=np.array(gaps_k["continuous"]), disc_k=np.array(gaps_k["discrete"]),
        cont_b=np.array(gaps_b["continuous"]), disc_b=np.array(gaps_b["discrete"]),
        rf_k=np.array(gaps_k["reduced flip"]), rf_b=np.array(gaps_b["reduced flip"]),
    )
    plt.close(fig)


def fig_trajectory_fan(out_dir: str, quick: bool = False):
    """2-D rough-well exploration scatter: MJHMC vs control HMC."""
    dist = RoughWell(ndims=2)
    steps = 100 if quick else 400
    nbatch = 16
    fig, axes = plt.subplots(1, 2, figsize=(10, 5))
    artifacts = {}
    for ax, (name, cls, kw) in zip(
        axes,
        [
            ("mjhmc", MarkovJumpHMC, dict(epsilon=4.0, beta=0.05, num_leapfrog_steps=10)),
            ("control_hmc", ControlHMC, dict(epsilon=4.0, beta=0.1, num_leapfrog_steps=10)),
        ],
    ):
        s = cls(dist, nbatch=nbatch, seed=0, **kw)
        out = s.sample(steps)
        xs = np.asarray(out["x"])  # (T, 2, n)
        for c in range(nbatch):
            ax.plot(xs[:, 0, c], xs[:, 1, c], lw=0.3, alpha=0.5)
        ax.set_title(f"{name}: {steps} iterations, {nbatch} chains")
        ax.set_xlim(-300, 300)
        ax.set_ylim(-300, 300)
        artifacts[name] = xs
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "trajectory_fan.png"), dpi=120)
    np.savez(os.path.join(out_dir, "trajectory_fan.npz"), **artifacts)
    plt.close(fig)


def fig_tempering(out_dir: str, quick: bool = False):
    """Mode recovery on the two-mode mixture: stuck HMC vs parallel
    tempering from the same one-basin init, against the exact density."""
    import jax.numpy as jnp

    from mjhmc_tpu.models import GaussianMixture
    from mjhmc_tpu.samplers import ParallelTempering

    dist = GaussianMixture()  # modes ±4, σ=0.8
    steps = 400 if quick else 3000
    nbatch = 64 if quick else 256

    hmc = ControlHMC(dist, epsilon=0.4, beta=1.0, num_leapfrog_steps=5,
                     nbatch=nbatch, seed=0)
    x_stuck = jnp.full_like(hmc.state.chain.x, -4.0)
    hmc.state = hmc.state._replace(
        chain=hmc.state.chain._replace(
            x=x_stuck,
            u=dist.potential(x_stuck),
            grad=dist.grad_potential(x_stuck),
        )
    )
    xs_hmc = np.asarray(hmc.sample(steps)["x"]).ravel()

    pt = ParallelTempering(dist, epsilon=0.4, num_leapfrog_steps=5,
                           nbatch=nbatch, num_temps=6, beta_min=0.02, seed=0)
    x0 = jnp.full_like(pt.state.x, -4.0)
    u0, g0 = dist.potential_and_grad(x0)
    pt.state = pt.state._replace(x=x0, u=u0, grad=g0)
    pt.burn_in(200 if quick else 500)
    xs_pt = np.asarray(pt.sample(steps)["x"]).ravel()

    grid = np.linspace(-8, 8, 400)
    exact = np.exp(-np.asarray(dist.potential(jnp.asarray(grid)[None, :])))
    exact /= np.trapezoid(exact, grid)

    fig, ax = plt.subplots(figsize=(7, 4))
    bins = np.linspace(-8, 8, 80)
    ax.hist(xs_hmc, bins=bins, density=True, alpha=0.5,
            label="HMC (stuck init)")
    ax.hist(xs_pt, bins=bins, density=True, alpha=0.5,
            label="parallel tempering")
    ax.plot(grid, exact, "k-", lw=1.2, label="exact p(x)")
    ax.set_xlabel("x")
    ax.set_ylabel("density")
    ax.set_title("Two-mode mixture (≈12.5 kT barrier), both from the left basin")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "tempering.png"), dpi=120)
    np.savez(os.path.join(out_dir, "tempering.npz"),
             hmc=xs_hmc, pt=xs_pt, grid=grid, exact=exact,
             swap_rates=pt.swap_rates, betas=np.asarray(pt.betas))
    plt.close(fig)


FIGURES = {
    "autocorr": fig_autocorr_overlay,
    "spectral": fig_spectral_gap,
    "fan": fig_trajectory_fan,
    "tempering": fig_tempering,
}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="figures_out")
    p.add_argument("--quick", action="store_true", help="small/fast versions")
    p.add_argument("--only", choices=sorted(FIGURES), default=None)
    args = p.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    for name, fn in FIGURES.items():
        if args.only and name != args.only:
            continue
        print(f"[figures] {name} ...", flush=True)
        fn(args.out, quick=args.quick)
    print(f"[figures] wrote {args.out}/")


if __name__ == "__main__":
    main()
