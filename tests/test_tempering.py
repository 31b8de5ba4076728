"""Parallel tempering + Gaussian-mixture tests.

Oracles: closed-form mixture moments (models/mog.py), a direct NumPy
logsumexp check of the energy, and the defining failure mode — a
single-temperature HMC chain initialized in one basin of a ≈12.5 kT
two-mode target cannot cross, while the tempered ladder restores the
exact mode weights.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.models import GaussianMixture
from mjhmc_tpu.samplers import ControlHMC, ParallelTempering
from mjhmc_tpu.samplers.tempering import geometric_ladder, make_pt_state, pt_run


def _direct_potential(dist, x):
    """O(K·d·n) NumPy logsumexp oracle for the mixture energy."""
    mu, sig, w = dist._mu, dist._sigma, dist._w
    xs = np.asarray(x)  # (d, n)
    logits = np.stack(
        [
            np.log(w[k])
            - 0.5 * np.sum((xs - mu[k][:, None]) ** 2, axis=0) / sig[k] ** 2
            - dist.ndims * np.log(sig[k])
            for k in range(len(w))
        ]
    )
    m = logits.max(axis=0)
    return -(m + np.log(np.exp(logits - m).sum(axis=0)))


def test_mog_potential_matches_numpy_oracle():
    dist = GaussianMixture(
        ndims=3,
        means=((-2.0, 0.0, 1.0), (3.0, -1.0, 0.5), (0.0, 2.0, -2.0)),
        scales=(0.7, 1.3, 0.9),
        weights=(0.2, 0.5, 0.3),
    )
    x = jax.random.normal(jax.random.key(0), (3, 17)) * 2.0
    np.testing.assert_allclose(
        np.asarray(dist.potential(x)), _direct_potential(dist, x), rtol=1e-5
    )


def test_mog_fused_grad_matches_autodiff():
    dist = GaussianMixture(
        ndims=2,
        means=((-2.0, 1.0), (2.0, -1.0)),
        scales=(0.6, 1.1),
        weights=(0.4, 0.6),
    )
    x = jax.random.normal(jax.random.key(1), (2, 9)) * 3.0
    u, g = dist.potential_and_grad(x)
    np.testing.assert_allclose(np.asarray(u), np.asarray(dist.potential(x)), rtol=1e-5)
    g_ad = jax.vjp(dist.potential, x)[1](jnp.ones(9))[0]
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), rtol=1e-4, atol=1e-5)


def test_mog_rank_polymorphic():
    """Stacked leading axes broadcast through (the chain-axis-last contract)."""
    dist = GaussianMixture()
    x = jax.random.normal(jax.random.key(2), (4, 1, 11))
    assert dist.potential(x).shape == (4, 11)
    u, g = dist.potential_and_grad(x)
    assert u.shape == (4, 11) and g.shape == x.shape


def test_mog_init_matches_analytic_moments():
    dist = GaussianMixture(
        ndims=1, means=((-4.0,), (4.0,)), scales=(0.8, 0.8), weights=(0.3, 0.7)
    )
    x = dist.init_x(jax.random.key(3), 40_000)
    mean, var = np.asarray(dist.analytic_mean()), np.asarray(dist.analytic_var())
    assert abs(float(x.mean()) - mean[0]) < 0.06
    assert abs(float(x.var()) - var[0]) / var[0] < 0.03


def test_single_temperature_hmc_is_stuck():
    """The control experiment: plain HMC cannot cross the ≈12.5 kT barrier."""
    dist = GaussianMixture()  # modes ±4, σ=0.8
    s = ControlHMC(dist, epsilon=0.4, beta=1.0, num_leapfrog_steps=5,
                   nbatch=64, seed=0)
    # trap every chain in the left basin
    s.state = s.state._replace(
        chain=s.state.chain._replace(
            x=jnp.full_like(s.state.chain.x, -4.0),
            u=dist.potential(jnp.full_like(s.state.chain.x, -4.0)),
            grad=dist.grad_potential(jnp.full_like(s.state.chain.x, -4.0)),
        )
    )
    out = s.sample(400)
    assert float(out["x"][-100:].mean()) < -3.0  # still in the left mode


def test_parallel_tempering_crosses_modes():
    """PT from the same stuck init recovers both modes and the exact moments."""
    dist = GaussianMixture()  # symmetric ±4, σ=0.8 → mean 0, var 16.64
    pt = ParallelTempering(
        dist, epsilon=0.4, num_leapfrog_steps=5, nbatch=64,
        num_temps=6, beta_min=0.02, seed=0,
    )
    # identical stuck start: every replica of every chain in the left basin
    x0 = jnp.full_like(pt.state.x, -4.0)
    u0, g0 = dist.potential_and_grad(x0)
    pt.state = pt.state._replace(x=x0, u=u0, grad=g0)

    pt.burn_in(500)
    out = pt.sample(2500)
    xs = np.asarray(out["x"])  # (steps, 1, nbatch)

    var = float(np.asarray(dist.analytic_var())[0])
    right_frac = float((xs > 0).mean())
    assert 0.4 < right_frac < 0.6  # both modes, correct weights
    assert abs(xs.mean()) < 0.45
    assert abs(xs.var() - var) / var < 0.12

    # ladder health: every adjacent pair actually exchanges
    assert (pt.swap_rates > 0.2).all()
    assert (pt.accept_rates > 0.5).all()


def test_pt_cost_model():
    """grad_evals = T · M per chain per iteration, exactly."""
    dist = GaussianMixture()
    pt = ParallelTempering(dist, nbatch=8, num_temps=4, num_leapfrog_steps=3, seed=1)
    pt.sample(10)
    np.testing.assert_array_equal(
        np.asarray(pt.state.grad_evals), np.full(8, 10 * 4 * 3, np.int32)
    )


def test_pt_replica_flow():
    """Replica identities stay a permutation of 0..T−1 per chain, and on a
    healthy ladder replicas complete hot→cold round trips."""
    dist = GaussianMixture()
    pt = ParallelTempering(
        dist, epsilon=0.4, num_leapfrog_steps=5, nbatch=32,
        num_temps=5, beta_min=0.05, seed=3,
    )
    pt.sample(600)
    rid = np.asarray(pt.state.replica_id)  # (T, n)
    np.testing.assert_array_equal(
        np.sort(rid, axis=0), np.arange(5)[:, None].repeat(32, axis=1)
    )
    assert pt.round_trip_rate > 0.0
    # every chain's replicas completed at least one passage collectively
    assert (np.asarray(pt.state.round_trips).sum(axis=0) > 0).all()


def test_pt_autocorrelation_experiment():
    """calculate_autocorrelation dispatches PT: ρ finite, cost axis charges
    all T replicas (evals/step/chain = T·M exactly)."""
    from mjhmc_tpu.experiments import calculate_autocorrelation

    dist = GaussianMixture()
    res = calculate_autocorrelation(
        dist, "pt", num_steps=300, nbatch=32, nlags=60, burn_steps=100,
        use_cached_init=False, epsilon=0.4, num_leapfrog_steps=5,
        num_temps=4, beta_min=0.05,
    )
    assert np.isfinite(res.rho).all() and res.rho[0] > 0.9
    per_step = res.grad_evals[1] - res.grad_evals[0]
    assert per_step == 4 * 5  # T·M
    assert res.total_grad_evals == 300 * 32 * 4 * 5


def test_pt_state_checkpoint_roundtrip(tmp_path):
    """PTState (incl. replica-flow fields) survives save/load bit-exactly."""
    from mjhmc_tpu.samplers.tempering import make_pt_state
    from mjhmc_tpu.utils.checkpoint import load_pytree, save_pytree

    dist = GaussianMixture()
    pt = ParallelTempering(dist, nbatch=16, num_temps=4, seed=5)
    pt.sample(20)
    path = str(tmp_path / "pt.npz")
    save_pytree(path, pt.state)
    restored = load_pytree(path, make_pt_state(dist, jax.random.key(0), 16, 4))
    for a, b in zip(
        jax.tree_util.tree_leaves(pt.state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_geometric_ladder_endpoints():
    b = geometric_ladder(7, 0.01)
    assert b[0] == np.float32(0.01) and b[-1] == 1.0
    assert (np.diff(b) > 0).all()
    # geometric: constant ratio
    r = b[1:] / b[:-1]
    np.testing.assert_allclose(r, r[0], rtol=1e-5)


def test_update_ladder_invariants():
    from mjhmc_tpu.samplers.tempering import update_ladder

    b = geometric_ladder(5, 0.01)
    # uniform rates at target → unchanged ladder
    b2 = update_ladder(b, np.full(4, 0.4), target=0.4, eta=0.6)
    np.testing.assert_allclose(b2, b, rtol=1e-5)
    # hot pair swaps too much → its gap widens; cold pair starved → narrows
    rates = np.array([0.0, 0.4, 0.4, 0.9])
    b3 = update_ladder(b, rates, target=0.4, eta=0.6)
    assert b3[-1] == 1.0 and (np.diff(b3) > 0).all()
    gaps_old, gaps_new = np.diff(np.log(b)), np.diff(np.log(b3))
    assert gaps_new[0] < gaps_old[0]  # starved pair pulled together
    assert gaps_new[-1] > gaps_old[-1]  # over-swapping pair pushed apart


def test_adapt_ladder_equalizes_swap_rates():
    """From a badly skewed ladder, windowed adaptation flattens the
    per-pair swap-rate profile and sampling afterwards is still exact."""
    dist = GaussianMixture()
    pt = ParallelTempering(
        dist, epsilon=0.4, num_leapfrog_steps=5, nbatch=64,
        num_temps=6, beta_min=0.001, seed=2,  # far too cold a base
    )
    pt.burn_in(200)
    # measure the initial profile over one window
    s0 = pt.state
    pt.state, _ = pt._run(pt.state, pt._next_key(), 100, "stats")
    r0 = (
        np.asarray(pt.state.n_swap_acc - s0.n_swap_acc).mean(axis=-1)
        / np.maximum(np.asarray(pt.state.n_swap_try - s0.n_swap_try), 1).mean(axis=-1)
    )
    pt.adapt_ladder(num_windows=15, window_size=60, target=0.4)
    pt.burn_in(200)
    s1 = pt.state
    pt.state, _ = pt._run(pt.state, pt._next_key(), 100, "stats")
    r1 = (
        np.asarray(pt.state.n_swap_acc - s1.n_swap_acc).mean(axis=-1)
        / np.maximum(np.asarray(pt.state.n_swap_try - s1.n_swap_try), 1).mean(axis=-1)
    )
    assert r1.std() < r0.std()  # flatter profile
    assert (r1 > 0.15).all() and abs(r1.mean() - 0.4) < 0.2
    # sampling with the tuned ladder remains exact
    out = pt.sample(1500)
    xs = np.asarray(out["x"])
    var = float(np.asarray(dist.analytic_var())[0])
    assert abs(xs.var() - var) / var < 0.15
    assert 0.35 < float((xs > 0).mean()) < 0.65


def test_pt_2d_mixture_moments():
    """Full PT path at ndims > 1: four modes on a square, exact moments."""
    dist = GaussianMixture(
        ndims=2,
        means=((-3.0, -3.0), (-3.0, 3.0), (3.0, -3.0), (3.0, 3.0)),
        scales=(0.7, 0.7, 0.7, 0.7),
        weights=(0.25, 0.25, 0.25, 0.25),
    )
    pt = ParallelTempering(
        dist, epsilon=0.35, num_leapfrog_steps=5, nbatch=128,
        num_temps=6, beta_min=0.02, seed=7,
    )
    pt.burn_in(300)
    xs = np.asarray(pt.sample(1500)["x"])  # (steps, 2, n)
    var = np.asarray(dist.analytic_var())  # [9.49, 9.49]
    np.testing.assert_allclose(xs.var(axis=(0, 2)), var, rtol=0.12)
    assert np.abs(xs.mean(axis=(0, 2))).max() < 0.5


def test_pt_single_temperature_reduces_to_hmc_target():
    """T=1 PT is plain full-refresh HMC on the base target (moment check)."""
    dist = GaussianMixture(ndims=1, means=((0.0,),), scales=(1.5,), weights=(1.0,))
    state = make_pt_state(dist, jax.random.key(4), 256, 1)
    betas = jnp.ones(1)
    state, out = jax.jit(
        lambda s, k: pt_run(dist, s, k, 800, betas, 0.5, 5)
    )(state, jax.random.key(5))
    xs = np.asarray(out["x"][200:])
    assert abs(xs.var() - 2.25) / 2.25 < 0.1
