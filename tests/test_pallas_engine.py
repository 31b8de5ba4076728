"""Fused Pallas MJHMC engine tests.

Statistical-agreement tests run only on real TPU hardware (the kernel is
Mosaic-compiled; tests/ otherwise run on the forced-CPU platform). On CPU
we still cover the host-side plumbing: energy-spec codegen, layout
reshapes, and unsupported-energy erroring.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjhmc_tpu.models import Gaussian, ProductOfT, RoughWell, SparseCoding
from mjhmc_tpu.ops.pallas_mjhmc import (
    GaussianSpec,
    MatmulEnergySpec,
    RoughWellSpec,
    energy_spec_for,
)

ON_TPU = jax.default_backend() == "tpu"


def test_energy_spec_codegen_matches_distribution():
    """Spec-emitted u/du (on (d,8,L) layout) == distribution's fused pg."""
    for dist in (RoughWell(ndims=2), Gaussian(ndims=4, log_conditioning=2.0)):
        spec = energy_spec_for(dist)
        n = 32
        x = dist.init_x(jax.random.key(0), n)
        u_ref, g_ref = dist.potential_and_grad(x)
        x3 = x.reshape(dist.ndims, 8, n // 8)
        params = jnp.broadcast_to(
            jnp.asarray(spec.param_vector(dist.ndims))[:, None, None], x3.shape
        )
        u3 = spec.u_sum(x3, params).reshape(n)
        g3 = spec.du(x3, params).reshape(dist.ndims, n)
        np.testing.assert_allclose(np.asarray(u3), np.asarray(u_ref), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g3), np.asarray(g_ref), rtol=1e-5)


def test_matmul_spec_codegen_matches_distribution():
    """Matmul-energy specs (2-D layout): u/du == distribution's fused pg,
    including a custom-patch sparse coder (params built host-side).

    Tolerance is precision-class aware: sparse coding's default 'bf16x3'
    split-float dot truncates explicitly (so its real error shows even on
    CPU, where Precision.DEFAULT computes full f32) and the σ⁻²=100 fit
    term amplifies the ~2⁻¹⁸ split residual to ~2e-3 absolute in du —
    bounded at 5e-3 here, with the raw split accuracy pinned separately in
    test_bf16x3_dot_accuracy_class.
    """
    dists = (
        ProductOfT(ndims=36, nbasis=36),
        SparseCoding(npixels=64, nbasis=128),
        SparseCoding.with_patch(np.linspace(-1, 1, 64), nbasis=96),
    )
    for dist in dists:
        spec = energy_spec_for(dist)
        assert isinstance(spec, MatmulEnergySpec)
        tol = {"bf16x3": 5e-3}.get(spec.precision, 1e-4)
        n = 128
        x = dist.init_x(jax.random.key(0), n)
        u_ref, g_ref = dist.potential_and_grad(x)
        params = [jnp.asarray(p) for p in spec.param_arrays()]
        u2 = spec.u_sum(x, *params)
        g2 = spec.du(x, *params)
        assert u2.shape == (1, n)
        np.testing.assert_allclose(
            np.asarray(u2[0]), np.asarray(u_ref), rtol=tol, atol=tol
        )
        np.testing.assert_allclose(
            np.asarray(g2), np.asarray(g_ref), rtol=tol, atol=tol
        )
        if spec.precision != "highest":
            exact = dataclasses.replace(spec, precision="highest")
            np.testing.assert_allclose(
                np.asarray(exact.du(x, *params)), np.asarray(g_ref),
                rtol=1e-4, atol=1e-4,
            )


def test_bf16x3_dot_accuracy_class():
    """The 3-pass split-float dot is f32-class: ~500× tighter than one
    bf16 pass, within ~2⁻¹⁸·√k of the full-f32 contraction."""
    from mjhmc_tpu.ops.pallas_mjhmc import _dot_bf16x3

    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((128, 256)), jnp.float32)
    ref = jax.lax.dot_general(
        a, b, ((((1,), (0,)), ((), ()))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    got = _dot_bf16x3(a, b, ((1,), (0,)))
    scale = float(jnp.abs(ref).max())
    err3 = float(jnp.abs(got - ref).max()) / scale
    bf1 = jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        ((((1,), (0,)), ((), ()))), preferred_element_type=jnp.float32,
    )
    err1 = float(jnp.abs(bf1 - ref).max()) / scale
    assert err3 < 3e-5, err3        # ≈ 2⁻¹⁸·√k class
    assert err3 < err1 / 50, (err3, err1)  # far tighter than one bf16 pass


def test_bf16x2_dot_is_exact_for_truncated_first_operand():
    """The two-pass split (VERDICT r4 item 6) computes bf16(a)·b up to
    the b_lo re-truncation residual (~2⁻¹⁷·√k — the same class as
    bf16x3's dropped lo·lo term): its error vs the true product is
    dominated by the ONE-TIME truncation of the first (parameter)
    operand, so against the semantically-equivalent f32 reference
    dot(bf16(a), b) it must sit at split-residual tolerance, while a
    full single bf16 pass (which also truncates b per step) is far
    looser."""
    from mjhmc_tpu.ops.pallas_mjhmc import _dot_bf16x2

    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((128, 256)), jnp.float32)
    got = _dot_bf16x2(a, b, ((1,), (0,)))
    semantic_ref = jax.lax.dot_general(
        a.astype(jnp.bfloat16).astype(jnp.float32), b,
        ((((1,), (0,)), ((), ()))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    scale = float(jnp.abs(semantic_ref).max())
    assert float(jnp.abs(got - semantic_ref).max()) / scale < 3e-5

    # vs the true product: b's contribution is exact, so the bf16x2
    # error ≈ half a single bf16 pass's (one truncated operand, not two)
    ref = jax.lax.dot_general(
        a, b, ((((1,), (0,)), ((), ()))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    err2 = float(jnp.abs(got - ref).max()) / scale
    bf1 = jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        ((((1,), (0,)), ((), ()))), preferred_element_type=jnp.float32,
    )
    err1 = float(jnp.abs(bf1 - ref).max()) / scale
    assert err2 < err1, (err2, err1)


def test_stub_dots_ablation_keeps_shapes_and_data_dependence():
    """MatmulEnergySpec._dot's stub_dots ablation (VERDICT r4 item 5):
    shapes match the real contraction's, outputs stay finite, and the
    result DEPENDS on the dynamic operand (so the downstream VPU work
    cannot be constant-folded away in the kernel being floor-measured)."""
    import dataclasses

    from mjhmc_tpu.ops.pallas_mjhmc import ProductOfTSpec, energy_spec_for

    dist = ProductOfT(ndims=36, nbasis=36)
    spec = energy_spec_for(dist)
    stub = dataclasses.replace(spec, stub_dots=True)
    assert isinstance(stub, ProductOfTSpec)
    n = 128
    x = dist.init_x(jax.random.key(0), n)
    params = [jnp.asarray(p) for p in spec.param_arrays()]
    g_real, g_stub = spec.du(x, *params), stub.du(x, *params)
    u_real, u_stub = spec.u_sum(x, *params), stub.u_sum(x, *params)
    assert g_stub.shape == g_real.shape
    assert u_stub.shape == u_real.shape
    assert np.isfinite(np.asarray(g_stub)).all()
    assert np.isfinite(np.asarray(u_stub)).all()
    # data dependence: perturbing the state's first dim moves the stub
    x2 = x.at[0].add(1.0)
    assert not np.allclose(np.asarray(stub.u_sum(x2, *params)),
                           np.asarray(u_stub))
    # the pair path stubs too (the ablated kernel runs has_pair layout)
    X = stub.pair_pack(x, x)
    G, Y = stub.pair_du(X, *params)
    uf, ub = stub.pair_u_from_y(Y)
    assert G.shape == X.shape and uf.shape == (1, n)
    assert np.isfinite(np.asarray(G)).all()


def test_stub_dots_interpret_mode_kernel_runs():
    """The ablated spec must survive the full fused mm kernel (counters
    intact) — pinned in interpret mode so the floor measurement's kernel
    is known-well-formed before it ever reaches the chip."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    from mjhmc_tpu.ops.pallas_mjhmc import (
        energy_spec_for,
        pallas_mjhmc_mm_run,
    )

    dist = ProductOfT(ndims=36, nbasis=36)
    spec = dataclasses.replace(energy_spec_for(dist), stub_dots=True)
    n = 256
    x = dist.init_x(jax.random.key(0), n)
    v = jax.random.normal(jax.random.key(1), x.shape, jnp.float32)
    u, g = dist.potential_and_grad(x)
    out = pallas_mjhmc_mm_run(
        spec, x, v, g, u.reshape(1, n), jnp.zeros((1, n)),
        jnp.zeros((1, n)), jnp.int32(7), jnp.float32(0.1),
        jnp.float32(0.2), 20, 5, interpret=pltpu.InterpretParams(),
        variant="control",
    )
    np.testing.assert_array_equal(np.asarray(out.evals), 100)
    assert np.isfinite(np.asarray(out.x)).all()


@pytest.mark.skipif(not ON_TPU, reason="Mosaic kernel requires TPU")
def test_matmul_engine_streaming_matches_accumulators():
    """Matmul-engine streamed (x, dwell) pairs reproduce the in-kernel
    dwell-weighted moment accumulators (product-of-t)."""
    from mjhmc_tpu.ops.pallas_mjhmc import PallasMJHMC

    dist = ProductOfT(ndims=36, nbasis=36)
    eng = PallasMJHMC(
        dist, epsilon=0.12, beta=0.1, num_leapfrog_steps=5, nbatch=1024, seed=7
    )
    eng.run(400)  # burn in before both measurement windows
    xs, ws = eng.sample(400)
    assert xs.shape == (400, 36, eng.nbatch) and ws.shape == (400, eng.nbatch)
    w = np.asarray(ws)[:, None, :]
    x = np.asarray(xs)
    var_stream = (w * x**2).sum(axis=(0, 2)) / w.sum() - (
        (w * x).sum(axis=(0, 2)) / w.sum()
    ) ** 2
    out = eng.run(400)
    _, var_acc = PallasMJHMC.moments(out)
    ratio = var_stream / np.asarray(var_acc)
    assert abs(np.median(ratio) - 1.0) < 0.2, ratio


def test_unsupported_energy_raises():
    class _NoSpec:
        pass

    with pytest.raises(TypeError):
        energy_spec_for(_NoSpec())


@pytest.mark.skipif(not ON_TPU, reason="Mosaic kernel requires TPU")
def test_sharded_engine_matches_direct():
    """shard_map SPMD path over a ('chains',) mesh == direct kernel call
    (exactly, on a 1-device mesh: same seeds, same program)."""
    from mjhmc_tpu.ops.pallas_mjhmc import (
        energy_spec_for,
        pallas_mjhmc_run,
        sharded_pallas_mjhmc_run,
    )
    from mjhmc_tpu.parallel.mesh import make_chain_mesh

    dist = RoughWell(ndims=2)
    spec = energy_spec_for(dist)
    n, s = 2048, 8
    l = n // s
    x = dist.init_x(jax.random.key(0), n).reshape(2, s, l)
    v = jax.random.normal(jax.random.key(1), x.shape)
    u, g = dist.potential_and_grad(x.reshape(2, n))
    args = (
        spec, x, v, g.reshape(2, s, l), u.reshape(s, l),
        jnp.zeros((s, l)), jnp.zeros((s, l)),
        jnp.int32(3), jnp.float32(1.0), jnp.float32(0.1), 20, 5,
    )
    direct = pallas_mjhmc_run(*args)
    mesh = make_chain_mesh(1)
    sharded = sharded_pallas_mjhmc_run(mesh, *args)
    np.testing.assert_array_equal(np.asarray(direct.x), np.asarray(sharded.x))
    np.testing.assert_array_equal(np.asarray(direct.w), np.asarray(sharded.w))


@pytest.mark.skipif(not ON_TPU, reason="Mosaic kernel requires TPU")
def test_streaming_engine_matches_moments():
    """Streamed (x, dwell) pairs reproduce the accumulator moments and the
    rough-well oracle; evals counter accumulates across runs."""
    from mjhmc_tpu.ops.pallas_mjhmc import PallasMJHMC

    dist = RoughWell(ndims=2)
    eng = PallasMJHMC(
        dist, epsilon=1.0, beta=0.1, num_leapfrog_steps=10, nbatch=2048, seed=3
    )
    eng.run(300)
    xs, ws = eng.sample(600)
    assert xs.shape == (600, 2, eng.nbatch) and ws.shape == (600, eng.nbatch)
    w = np.asarray(ws)[:, None, :]
    x = np.asarray(xs)
    var = (w * x**2).sum(axis=(0, 2)) / w.sum()
    tgt = float(dist.analytic_var()[0])
    np.testing.assert_allclose(var, tgt, rtol=0.15)
    assert float(np.asarray(ws).mean()) == pytest.approx(0.907, rel=0.05)
    # counters: ~10-11 evals per chain-step across all 901 steps
    per_step = eng.grad_evals / (eng.steps_total * eng.nbatch)
    assert 10.0 <= per_step < 12.0, per_step


@pytest.mark.skipif(not ON_TPU, reason="Mosaic kernel requires TPU")
def test_matmul_engine_matches_xla_path_statistically():
    """Product-of-t fused engine (MXU contractions in-kernel) vs the XLA
    sampler: dwell mass, eval counts and dwell-weighted variances must
    agree within MC error; variances must also hit the analytic oracle."""
    from mjhmc_tpu.ops.pallas_mjhmc import PallasMJHMC
    from mjhmc_tpu.samplers import MarkovJumpHMC

    dist = ProductOfT(ndims=36, nbasis=36)
    steps = 600
    eng = PallasMJHMC(
        dist, epsilon=0.12, beta=0.1, num_leapfrog_steps=5, nbatch=4096, seed=0
    )
    eng.run(400)  # burn
    out = eng.run(steps)
    dwell_p = float(out.w.sum()) / (eng.nbatch * steps)
    evals_p = float(out.evals.mean())

    ref = MarkovJumpHMC(
        dist, epsilon=0.12, beta=0.1, num_leapfrog_steps=5, nbatch=4096, seed=1
    )
    ref.burn_in(400)
    rout = ref.sample(steps)
    dwell_x = float(np.asarray(rout["dwell"]).mean())
    evals_x = float(np.asarray(ref.state.grad_evals).mean())

    assert abs(dwell_p - dwell_x) < 0.05 * dwell_x
    assert abs(evals_p - evals_x) < 0.05 * evals_x

    _, var_p = PallasMJHMC.moments(out)
    xs = np.asarray(rout["x"])
    w = np.asarray(rout["dwell"])[:, None, :]
    var_x = (w * xs**2).sum(axis=(0, 2)) / w.sum()
    # heavy tails: compare the bulk (median ratio) rather than every dim
    ratio = np.asarray(var_p) / var_x
    assert abs(np.median(ratio) - 1.0) < 0.15, ratio
    tgt = np.asarray(dist.analytic_var())
    assert abs(np.median(np.asarray(var_p) / tgt) - 1.0) < 0.15


@pytest.mark.skipif(not ON_TPU, reason="Mosaic kernel requires TPU")
def test_sparse_coding_engine_matches_xla_moments():
    """Sparse-coding fused engine (f32 MXU) vs XLA path on the 128-D
    posterior: dwell mass, evals, and per-dim dwell-weighted moments."""
    from mjhmc_tpu.ops.pallas_mjhmc import PallasMJHMC
    from mjhmc_tpu.samplers import MarkovJumpHMC

    dist = SparseCoding(npixels=64, nbasis=128)
    steps = 600
    eng = PallasMJHMC(
        dist, epsilon=0.02, beta=0.1, num_leapfrog_steps=5, nbatch=2048, seed=0
    )
    eng.run(400)
    out = eng.run(steps)
    dwell_p = float(out.w.sum()) / (eng.nbatch * steps)
    mean_p, var_p = PallasMJHMC.moments(out)

    ref = MarkovJumpHMC(
        dist, epsilon=0.02, beta=0.1, num_leapfrog_steps=5, nbatch=2048, seed=1
    )
    ref.burn_in(400)
    rout = ref.sample(steps)
    dwell_x = float(np.asarray(rout["dwell"]).mean())
    xs = np.asarray(rout["x"])
    w = np.asarray(rout["dwell"])[:, None, :]
    mean_x = (w * xs).sum(axis=(0, 2)) / w.sum()
    var_x = (w * xs**2).sum(axis=(0, 2)) / w.sum() - mean_x**2

    assert abs(dwell_p - dwell_x) < 0.05 * dwell_x
    ratio = np.asarray(var_p) / var_x
    assert abs(np.median(ratio) - 1.0) < 0.15, ratio


@pytest.mark.skipif(not ON_TPU, reason="Mosaic kernel requires TPU")
def test_pallas_engine_matches_xla_path_statistically():
    """Dwell mass, eval counts, operator mix and moments must agree with
    the reference XLA sampler within MC error (different PRNG streams)."""
    from mjhmc_tpu.ops.pallas_mjhmc import PallasMJHMC
    from mjhmc_tpu.samplers import MarkovJumpHMC

    dist = RoughWell(ndims=2)
    steps = 300
    eng = PallasMJHMC(
        dist, epsilon=1.0, beta=0.1, num_leapfrog_steps=10, nbatch=4096, seed=0
    )
    out = eng.run(steps)
    dwell_p = float(out.w.sum()) / (eng.nbatch * steps)
    evals_p = float(out.evals.mean())

    ref = MarkovJumpHMC(
        dist, epsilon=1.0, beta=0.1, num_leapfrog_steps=10, nbatch=4096, seed=1
    )
    rout = ref.sample(steps)
    dwell_x = float(np.asarray(rout["dwell"]).mean())
    evals_x = float(np.asarray(ref.state.grad_evals).mean())

    assert abs(dwell_p - dwell_x) < 0.05 * dwell_x
    assert abs(evals_p - evals_x) < 0.05 * evals_x

    mean_p, var_p = PallasMJHMC.moments(out)
    xs = np.asarray(rout["x"])
    w = np.asarray(rout["dwell"])[:, None, :]
    var_x = (w * xs**2).sum(axis=(0, 2)) / w.sum()
    np.testing.assert_allclose(np.asarray(var_p), var_x, rtol=0.1)


def test_zoo_energy_spec_codegen_matches_distribution():
    """New fused specs (funnel, banana, mog) on the (d,8,L) layout and
    logreg on the 2-D matmul layout == the distributions' fused pg."""
    from mjhmc_tpu.models import Banana, Funnel, GaussianMixture
    from mjhmc_tpu.models.logreg import LogisticRegression

    for dist in (
        Funnel(ndims=8),
        Banana(ndims=4),
        GaussianMixture(),  # 1-D two-mode preset
        GaussianMixture(
            ndims=2,
            means=((-3.0, 1.0), (2.0, 0.0)),
            scales=(1.0, 0.5),
            weights=(0.3, 0.7),
        ),
    ):
        spec = energy_spec_for(dist)
        n, d = 32, dist.ndims
        x = dist.init_x(jax.random.key(0), n)
        u_ref, g_ref = dist.potential_and_grad(x)
        x3 = x.reshape(d, 8, n // 8)
        params = jnp.ones_like(x3)
        u3 = spec.u_sum(x3, params).reshape(n)
        g3 = spec.du(x3, params).reshape(d, n)
        np.testing.assert_allclose(
            np.asarray(u3), np.asarray(u_ref), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(g3), np.asarray(g_ref), rtol=2e-5, atol=2e-5
        )

    dist = LogisticRegression(ndims=16, nobs=64)
    spec = energy_spec_for(dist)
    assert isinstance(spec, MatmulEnergySpec)
    n = 128
    x = dist.init_x(jax.random.key(0), n)
    u_ref, g_ref = dist.potential_and_grad(x)
    params = [jnp.asarray(p) for p in spec.param_arrays()]
    np.testing.assert_allclose(
        np.asarray(spec.u_sum(x, *params)[0]), np.asarray(u_ref),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(spec.du(x, *params)), np.asarray(g_ref),
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.skipif(not ON_TPU, reason="Mosaic kernel requires TPU")
def test_preconditioned_engine_matches_analytic():
    """inv_mass in the fused kernel: an ill-conditioned Gaussian sampled
    with M⁻¹ = target variances must hit the analytic variances AND agree
    with the preconditioned jnp path's dwell mass / eval counters."""
    from mjhmc_tpu.ops.pallas_mjhmc import PallasMJHMC
    from mjhmc_tpu.samplers import MarkovJumpHMC

    dist = Gaussian(ndims=16, log_conditioning=3.0)
    im = tuple(float(v) for v in np.asarray(dist.variances))
    steps = 500
    eng = PallasMJHMC(
        dist, epsilon=1.0, beta=0.1, num_leapfrog_steps=10,
        nbatch=4096, seed=0, inv_mass=im,
    )
    eng.run(300)  # burn
    out = eng.run(steps)
    dwell_p = float(out.w.sum()) / (eng.nbatch * steps)
    evals_p = float(out.evals.mean())
    _, var_p = PallasMJHMC.moments(out)
    # preconditioning makes the 1000:1-conditioned target isotropic: one ε
    # mixes every dim; variances must hit the analytic diagonal
    ratio = np.asarray(var_p) / np.asarray(dist.variances)
    assert abs(np.median(ratio) - 1.0) < 0.1, ratio
    assert ratio.max() < 1.35 and ratio.min() > 0.65, ratio

    ref = MarkovJumpHMC(
        dist, epsilon=1.0, beta=0.1, num_leapfrog_steps=10,
        nbatch=4096, seed=1, mass_diag=tuple(1.0 / np.asarray(im)),
    )
    ref.burn_in(300)
    rout = ref.sample(steps)
    dwell_x = float(np.asarray(rout["dwell"]).mean())
    evals_x = float(np.asarray(ref.state.grad_evals).mean())
    assert abs(dwell_p - dwell_x) < 0.05 * dwell_x
    assert abs(evals_p - evals_x) < 0.05 * evals_x


@pytest.mark.skipif(not ON_TPU, reason="Mosaic kernel requires TPU")
def test_warmup_drives_engine_on_funnel():
    """mjhmc_full_warmup output (tuned ε + diagonal metric + warmed chains)
    drives the fused engine end-to-end on Neal's funnel; the dwell-weighted
    variances must bracket the closed-form marginals."""
    from mjhmc_tpu.ops.pallas_mjhmc import PallasMJHMC
    from mjhmc_tpu.models import Funnel

    dist = Funnel(ndims=8, sigma_v=2.0)
    eng = PallasMJHMC.from_warmup(
        dist, seed=0, nbatch=8192, beta=0.2, num_leapfrog_steps=10,
        phase1=200, phase2=300, phase3=150,
    )
    assert eng.inv_mass is not None and eng.epsilon > 0.0
    out = eng.run(3000)
    _, var = PallasMJHMC.moments(out)
    tgt = np.asarray(dist.analytic_var())
    # the funnel is the hard preconditioning benchmark: generous MC + bias
    # tolerance, but the metric must get every marginal's scale right
    ratio = np.asarray(var) / tgt
    assert ratio.min() > 0.5 and ratio.max() < 1.6, ratio


@pytest.mark.skipif(not ON_TPU, reason="Mosaic kernel requires TPU")
def test_zoo_engines_match_oracles():
    """Fused engines for the zoo energies (banana, mog, logreg) reproduce
    their closed-form / Laplace variance oracles."""
    from mjhmc_tpu.ops.pallas_mjhmc import PallasMJHMC
    from mjhmc_tpu.models import Banana, GaussianMixture
    from mjhmc_tpu.models.logreg import LogisticRegression

    # banana: exact moments
    dist = Banana(ndims=2)
    eng = PallasMJHMC(
        dist, epsilon=0.35, beta=0.15, num_leapfrog_steps=10,
        nbatch=4096, seed=0,
    )
    eng.run(500)
    out = eng.run(2000)
    _, var = PallasMJHMC.moments(out)
    ratio = np.asarray(var) / np.asarray(dist.analytic_var())
    assert abs(ratio[0] - 1.0) < 0.2 and abs(ratio[1] - 1.0) < 0.3, ratio

    # mog: exact-init chains + two close modes (samplable single-T)
    dist = GaussianMixture(means=((-1.5,), (1.5,)), scales=(1.0, 1.0))
    eng = PallasMJHMC(
        dist, epsilon=0.8, beta=0.2, num_leapfrog_steps=5,
        nbatch=4096, seed=0,
    )
    eng.run(300)
    out = eng.run(1500)
    _, var = PallasMJHMC.moments(out)
    ratio = float(var[0]) / float(dist.analytic_var()[0])
    assert abs(ratio - 1.0) < 0.2, ratio

    # logreg: Laplace variance oracle (log-concave), loose tolerance
    dist = LogisticRegression(ndims=16, nobs=256)
    eng = PallasMJHMC(
        dist, epsilon=0.25, beta=0.15, num_leapfrog_steps=10,
        nbatch=2048, seed=0,
    )
    eng.run(400)
    out = eng.run(1500)
    _, var = PallasMJHMC.moments(out)
    ratio = np.asarray(var) / dist.laplace_var()
    assert abs(np.median(ratio) - 1.0) < 0.25, ratio


@pytest.mark.skipif(not ON_TPU, reason="Mosaic kernel requires TPU")
def test_eight_schools_engine_matches_quadrature():
    """Fused engine on the eight-schools posterior (non-centered) — the
    one spec exercising the generalized 2d-row params plumbing on real
    Mosaic — reproduces the exact quadrature moments, preconditioned by
    the oracle variances."""
    from mjhmc_tpu.models import EightSchools
    from mjhmc_tpu.ops.pallas_mjhmc import PallasMJHMC

    dist = EightSchools(parameterization="noncentered")
    tgt = np.asarray(dist.analytic_var(), np.float64)
    eng = PallasMJHMC(
        dist, epsilon=0.6, beta=0.15, num_leapfrog_steps=8,
        nbatch=4096, seed=0, inv_mass=tuple(tgt),
    )
    eng.run(500)
    out = eng.run(2500)
    mean, var = PallasMJHMC.moments(out)
    qm = np.asarray(dist.analytic_mean(), np.float64)
    assert np.abs(np.asarray(mean) - qm).max() < 0.5, mean
    ratio = np.asarray(var) / tgt
    assert np.abs(ratio - 1.0).max() < 0.2, ratio


def test_interpret_mode_counters_exact_both_variants():
    """CPU-runnable counter pin via TPU-interpret mode.

    The interpret backend stubs ``prng_random_bits`` to zeros, which makes
    runs deterministic (uniform ≈ 0 ⟹ MJHMC always selects L; control
    always accepts) — exactly what's needed to pin the int32 eval plumbing:
    control = M·steps per chain; MJHMC = M·steps + M (the single fresh
    backward rebuild at step 0, never invalidated since R never fires).
    Control's Σweight must equal steps exactly (unit weights)."""
    from jax.experimental.pallas import tpu as pltpu

    from mjhmc_tpu.ops.pallas_mjhmc import energy_spec_for, pallas_mjhmc_run

    dist = RoughWell(ndims=2)
    spec = energy_spec_for(dist)
    n, s = 1024, 8
    l = n // s
    x = dist.init_x(jax.random.key(0), n).reshape(2, s, l)
    v = jax.random.normal(jax.random.key(1), x.shape, jnp.float32)
    u, g = dist.potential_and_grad(x.reshape(2, n))
    args = (
        spec, x, v, g.reshape(2, s, l), u.reshape(s, l),
        jnp.zeros((s, l)), jnp.zeros((s, l)),
        jnp.int32(7), jnp.float32(1.0), jnp.float32(0.1), 100, 10,
    )
    ip = pltpu.InterpretParams()
    out = pallas_mjhmc_run(*args, interpret=ip)
    assert out.evals.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out.evals), 1010)

    out_c = pallas_mjhmc_run(*args, interpret=ip, variant="control")
    np.testing.assert_array_equal(np.asarray(out_c.evals), 1000)
    np.testing.assert_array_equal(np.asarray(out_c.w), 100.0)

    # MALT: exactly M·steps per chain (trajectory-level MH never adds
    # rebuild cost), unit weights
    out_m = pallas_mjhmc_run(*args, interpret=ip, variant="malt")
    np.testing.assert_array_equal(np.asarray(out_m.evals), 1000)
    np.testing.assert_array_equal(np.asarray(out_m.w), 100.0)


@pytest.mark.skipif(not ON_TPU, reason="Mosaic kernel requires TPU")
def test_control_engine_matches_xla_hmc_statistically():
    """Fused ControlHMC engine vs samplers.hmc (same ε, β, M, different
    PRNG streams): acceptance-driven variance and step-count weights must
    agree within MC error, and hit the Gaussian analytic variance."""
    from mjhmc_tpu.ops.pallas_mjhmc import PallasControlHMC, PallasMJHMC
    from mjhmc_tpu.samplers import ControlHMC

    dist = Gaussian(ndims=4, log_conditioning=2.0)
    steps = 600
    eng = PallasControlHMC(
        dist, epsilon=0.15, beta=0.25, num_leapfrog_steps=10,
        nbatch=4096, seed=0,
    )
    eng.run(400)  # burn
    out = eng.run(steps)
    np.testing.assert_array_equal(np.asarray(out.w), float(steps))
    np.testing.assert_array_equal(np.asarray(out.evals), steps * 10)
    mean_p, var_p = PallasMJHMC.moments(out)

    ref = ControlHMC(
        dist, epsilon=0.15, beta=0.25, num_leapfrog_steps=10,
        nbatch=4096, seed=1,
    )
    ref.burn_in(400)
    rout = ref.sample(steps)
    xs = np.asarray(rout["x"])
    var_x = (xs**2).mean(axis=(0, 2)) - xs.mean(axis=(0, 2)) ** 2

    ratio = np.asarray(var_p) / var_x
    assert abs(np.median(ratio) - 1.0) < 0.12, ratio
    tgt = np.asarray(dist.variances)
    assert abs(np.median(np.asarray(var_p) / tgt) - 1.0) < 0.12


@pytest.mark.skipif(not ON_TPU, reason="Mosaic kernel requires TPU")
def test_control_engine_streaming_matches_run():
    """Streamed control emissions (unit weights, post-transition x) match
    the batch accumulators; evals stay exact across the streaming path."""
    from mjhmc_tpu.ops.pallas_mjhmc import PallasControlHMC, PallasMJHMC

    dist = RoughWell(ndims=2)
    eng = PallasControlHMC(
        dist, epsilon=1.0, beta=0.3, num_leapfrog_steps=10, nbatch=2048, seed=5
    )
    eng.run(300)
    xs, ws = eng.sample(500)
    assert xs.shape == (500, 2, eng.nbatch)
    np.testing.assert_array_equal(np.asarray(ws), 1.0)
    var_stream = np.asarray(xs).var(axis=(0, 2))
    out = eng.run(500)
    np.testing.assert_array_equal(np.asarray(out.evals), 5000)
    _, var_acc = PallasMJHMC.moments(out)
    ratio = var_stream / np.asarray(var_acc)
    assert abs(np.median(ratio) - 1.0) < 0.2, ratio


@pytest.mark.skipif(not ON_TPU, reason="Mosaic kernel requires TPU")
def test_long_run_counters_exact_and_kahan_survives():
    """CLAUDE.md exactness invariant at bench-scale step counts.

    2^25 control iterations at M=1: per-chain int32 evals == 2^25 exactly,
    and the Σweight accumulator == 2^25.0 exactly — a plain f32 running sum
    of ones STALLS at 2^24 (16777216.0 + 1.0 == 16777216.0), so this pins
    that the Kahan compensation survived Mosaic compilation. The MJHMC
    variant at 2^21 steps pins the cost model's bounds and divisibility."""
    from mjhmc_tpu.ops.pallas_mjhmc import PallasControlHMC, PallasMJHMC

    dist = RoughWell(ndims=2)
    steps = 1 << 25
    eng = PallasControlHMC(
        dist, epsilon=1.0, beta=0.5, num_leapfrog_steps=1, nbatch=1024, seed=2
    )
    out = eng.run(steps)
    np.testing.assert_array_equal(np.asarray(out.evals), steps)
    np.testing.assert_array_equal(np.asarray(out.w), float(steps))

    m = 10
    steps_mj = 1 << 21
    eng2 = PallasMJHMC(
        dist, epsilon=1.0, beta=0.1, num_leapfrog_steps=m, nbatch=1024, seed=3
    )
    out2 = eng2.run(steps_mj)
    ev = np.asarray(out2.evals, np.int64)
    assert np.all(ev % m == 0)
    assert np.all(ev >= m * steps_mj) and np.all(ev <= 2 * m * steps_mj)
    # R fires ≈ β/(Γ_L+β) of iterations; rebuild share must be sane, not 0/1
    rebuild_frac = (ev / (m * steps_mj) - 1.0).mean()
    assert 0.005 < rebuild_frac < 0.5, rebuild_frac


def test_interpret_mode_counters_exact_matmul_layout():
    """Same deterministic interpret-mode counter pin on the 2-D matmul
    layout (product-of-t): control = M·steps; MJHMC = M·steps + M."""
    from jax.experimental.pallas import tpu as pltpu

    from mjhmc_tpu.ops.pallas_mjhmc import (
        energy_spec_for,
        pallas_mjhmc_mm_run,
    )

    dist = ProductOfT(ndims=36, nbasis=36)
    spec = energy_spec_for(dist)
    n = 256
    x = dist.init_x(jax.random.key(0), n)
    v = jax.random.normal(jax.random.key(1), x.shape, jnp.float32)
    u, g = dist.potential_and_grad(x)
    args = (
        spec, x, v, g, u.reshape(1, n), jnp.zeros((1, n)), jnp.zeros((1, n)),
        jnp.int32(7), jnp.float32(0.1), jnp.float32(0.2), 50, 5,
    )
    ip = pltpu.InterpretParams()
    out_c = pallas_mjhmc_mm_run(*args, interpret=ip, variant="control")
    np.testing.assert_array_equal(np.asarray(out_c.evals), 250)
    np.testing.assert_array_equal(np.asarray(out_c.w), 50.0)
    out_m = pallas_mjhmc_mm_run(*args, interpret=ip)
    np.testing.assert_array_equal(np.asarray(out_m.evals), 255)
    out_l = pallas_mjhmc_mm_run(*args, interpret=ip, variant="malt")
    np.testing.assert_array_equal(np.asarray(out_l.evals), 250)
    np.testing.assert_array_equal(np.asarray(out_l.w), 50.0)


@pytest.mark.skipif(not ON_TPU, reason="Mosaic kernel requires TPU")
def test_malt_engine_matches_xla_malt_statistically():
    """Fused MALT engine vs samplers.malt (same ε, γ, M; independent PRNG
    streams): Gaussian variances within MC error of each other and of the
    analytic values; γ=0 must reproduce full-refresh ControlHMC(β=1)
    acceptance-driven variance (MALT's defining limit)."""
    from mjhmc_tpu.ops.pallas_mjhmc import PallasMALT, PallasMJHMC
    from mjhmc_tpu.samplers.malt import MALT

    dist = Gaussian(ndims=4, log_conditioning=2.0)
    steps = 600
    eng = PallasMALT(
        dist, epsilon=0.15, beta=1.5, num_leapfrog_steps=10,
        nbatch=4096, seed=0,
    )
    eng.run(400)  # burn
    out = eng.run(steps)
    np.testing.assert_array_equal(np.asarray(out.w), float(steps))
    np.testing.assert_array_equal(np.asarray(out.evals), steps * 10)
    _, var_p = PallasMJHMC.moments(out)

    ref = MALT(
        dist, epsilon=0.15, gamma=1.5, num_leapfrog_steps=10,
        nbatch=4096, seed=1,
    )
    ref.burn_in(400)
    xs = np.asarray(ref.sample(steps)["x"])
    var_x = (xs**2).mean(axis=(0, 2)) - xs.mean(axis=(0, 2)) ** 2

    ratio = np.asarray(var_p) / var_x
    assert abs(np.median(ratio) - 1.0) < 0.12, ratio
    tgt = np.asarray(dist.variances)
    assert abs(np.median(np.asarray(var_p) / tgt) - 1.0) < 0.12

    # γ=0 limit: MALT == full-refresh HMC — variances must still land on
    # the analytic target (the OU steps become identity)
    eng0 = PallasMALT(
        dist, epsilon=0.15, beta=0.0, num_leapfrog_steps=10,
        nbatch=4096, seed=2,
    )
    eng0.run(400)
    _, var_0 = PallasMJHMC.moments(eng0.run(steps))
    assert abs(np.median(np.asarray(var_0) / tgt) - 1.0) < 0.12


def test_interpret_mode_nuts_invariants():
    """CPU-runnable NUTS-variant pin via TPU-interpret mode.

    With ``prng_random_bits`` stubbed to zeros the tree build is fully
    deterministic, so the plumbing invariants are exact: unit weights
    (Σw per chain == steps), int32 leaf counters bounded by
    [steps, steps·(2^max_depth − 1)], and bit-identical repeat runs."""
    from jax.experimental.pallas import tpu as pltpu

    from mjhmc_tpu.ops.pallas_mjhmc import energy_spec_for, pallas_mjhmc_run

    dist = Gaussian(ndims=2, log_conditioning=1.0)
    spec = energy_spec_for(dist)
    n, s = 1024, 8
    l = n // s
    x = dist.init_x(jax.random.key(0), n)
    u, g = dist.potential_and_grad(x)
    steps, max_depth = 20, 5
    args = (
        spec, x.reshape(2, s, l), jnp.zeros((2, s, l)),
        g.reshape(2, s, l), u.reshape(s, l),
        jnp.zeros((s, l)), jnp.zeros((s, l)),
        jnp.int32(7), jnp.float32(0.4), jnp.float32(0.0), steps, max_depth,
    )
    ip = pltpu.InterpretParams()
    out = pallas_mjhmc_run(*args, interpret=ip, variant="nuts")
    assert out.evals.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out.w), float(steps))
    ev = np.asarray(out.evals)
    assert ev.min() >= steps and ev.max() <= steps * (2**max_depth - 1), (
        ev.min(), ev.max()
    )
    assert float(jnp.max(jnp.abs(out.x - args[1]))) > 0.0  # chains moved

    out2 = pallas_mjhmc_run(*args, interpret=ip, variant="nuts")
    np.testing.assert_array_equal(np.asarray(out2.evals), ev)
    np.testing.assert_array_equal(np.asarray(out2.x), np.asarray(out.x))


@pytest.mark.skipif(not ON_TPU, reason="Mosaic kernel requires TPU")
def test_nuts_engine_matches_xla_nuts_statistically():
    """Fused NUTS engine vs samplers.nuts (same ε, max_depth; independent
    PRNG streams): Gaussian variances within MC error of each other and of
    the analytic values; mean tree size (leaves/iteration — the exact
    algorithmic counter both paths carry) must agree within MC error, the
    sharpest cross-check that the in-kernel tree transition law is the
    XLA path's."""
    from mjhmc_tpu.ops.pallas_mjhmc import PallasMJHMC, PallasNUTS
    from mjhmc_tpu.samplers import NUTS

    dist = Gaussian(ndims=8, log_conditioning=2.0)
    steps = 500
    eng = PallasNUTS(
        dist, epsilon=0.25, num_leapfrog_steps=8, nbatch=4096, seed=0,
    )
    eng.run(50)  # burn
    out = eng.run(steps)
    np.testing.assert_array_equal(np.asarray(out.w), float(steps))
    _, var_p = PallasMJHMC.moments(out)
    leaves_eng = float(np.asarray(out.evals).mean()) / steps

    ref = NUTS(dist, epsilon=0.25, max_depth=8, nbatch=1024, seed=1)
    ref.burn_in(50)
    o = ref.sample(steps)
    xs = np.asarray(o["x"])
    var_x = (xs**2).mean(axis=(0, 2)) - xs.mean(axis=(0, 2)) ** 2
    ev = np.asarray(o["evals_mean"])
    leaves_xla = float(ev[-1] - ev[0]) / (steps - 1)

    ratio = np.asarray(var_p) / var_x
    assert abs(np.median(ratio) - 1.0) < 0.12, ratio
    tgt = np.asarray(dist.variances)
    assert abs(np.median(np.asarray(var_p) / tgt) - 1.0) < 0.12
    assert abs(leaves_eng / leaves_xla - 1.0) < 0.1, (leaves_eng, leaves_xla)


@pytest.mark.skipif(not ON_TPU, reason="Mosaic kernel requires TPU")
def test_nuts_engine_streaming_matches_run():
    """Streamed NUTS emissions (unit weights, post-transition x) match the
    batch accumulators; the leaf counters stay plausible (≥ 1 leaf/step)
    across the streaming DMA path."""
    from mjhmc_tpu.ops.pallas_mjhmc import PallasMJHMC, PallasNUTS

    dist = Gaussian(ndims=4, log_conditioning=1.0)
    eng = PallasNUTS(
        dist, epsilon=0.5, num_leapfrog_steps=6, nbatch=2048, seed=5,
    )
    eng.run(100)
    xs, ws = eng.sample(400)
    assert xs.shape == (400, 4, eng.nbatch)
    np.testing.assert_array_equal(np.asarray(ws), 1.0)
    var_stream = np.asarray(xs).var(axis=(0, 2))
    out = eng.run(400)
    assert np.asarray(out.evals).min() >= 400
    _, var_acc = PallasMJHMC.moments(out)
    ratio = var_stream / np.asarray(var_acc)
    assert abs(np.median(ratio) - 1.0) < 0.2, ratio


@pytest.mark.skipif(not ON_TPU, reason="Mosaic kernel requires TPU")
def test_nuts_engine_matmul_layout_matches_xla():
    """NUTS engine on the matmul layout (product-of-t: MXU contractions
    inside every tree leaf) vs the XLA NUTS: per-dim variances within MC
    error of each other and of the analytic covariance diagonal, and mean
    tree size within MC error."""
    from mjhmc_tpu.ops.pallas_mjhmc import PallasMJHMC, PallasNUTS
    from mjhmc_tpu.samplers import NUTS

    dist = ProductOfT(ndims=36, nbasis=36)
    steps = 400
    eng = PallasNUTS(
        dist, epsilon=0.12, num_leapfrog_steps=7, nbatch=2048, seed=0,
    )
    eng.run(100)
    out = eng.run(steps)
    np.testing.assert_array_equal(np.asarray(out.w), float(steps))
    _, var_p = PallasMJHMC.moments(out)
    leaves_eng = float(np.asarray(out.evals).mean()) / steps

    ref = NUTS(dist, epsilon=0.12, max_depth=7, nbatch=512, seed=1)
    ref.burn_in(100)
    o = ref.sample(steps)
    xs = np.asarray(o["x"])
    var_x = (xs**2).mean(axis=(0, 2)) - xs.mean(axis=(0, 2)) ** 2
    ev = np.asarray(o["evals_mean"])
    leaves_xla = float(ev[-1] - ev[0]) / (steps - 1)

    ratio = np.asarray(var_p) / var_x
    assert abs(np.median(ratio) - 1.0) < 0.15, ratio
    tgt = np.asarray(dist.analytic_var())
    assert abs(np.median(np.asarray(var_p) / tgt) - 1.0) < 0.15
    assert abs(leaves_eng / leaves_xla - 1.0) < 0.12, (leaves_eng, leaves_xla)


def test_nuts_from_warmup_constructs_tuned_engine():
    """CPU-runnable: PallasNUTS.from_warmup runs the XLA NUTS warmup and
    hands (ε, M⁻¹) to the engine fields without launching the kernel."""
    from mjhmc_tpu.ops.pallas_mjhmc import PallasNUTS

    dist = Gaussian(ndims=2, log_conditioning=2.0)
    eng = PallasNUTS.from_warmup(
        dist, seed=3, nbatch=1024, max_depth=6,
        phase1=8, phase2=8, phase3=6,
    )
    assert eng.variant == "nuts"
    assert eng.num_leapfrog_steps == 6
    assert eng.epsilon > 0.0
    iv = np.asarray(eng.inv_mass, np.float64)
    assert iv.shape == (2,) and (iv > 0).all()
    # variance-estimated M⁻¹ must reflect the 10^2 conditioning spread
    assert iv.max() / iv.min() > 3.0, iv


def test_interpret_mode_streamed_eval_counters_exact():
    """CPU pin of the streamed third channel (VERDICT r3 item 4): the
    per-emission cumulative int32 eval counters must be exact. Interpret
    mode is deterministic (zero PRNG bits ⟹ MJHMC always selects L, one
    fresh backward rebuild at step 0): with thin=1 the counter after
    emission t is M·(t+1) + M for MJHMC and M·(t+1) for control — and the
    final emission must equal the batch accumulator."""
    from jax.experimental.pallas import tpu as pltpu

    from mjhmc_tpu.ops.pallas_mjhmc import (
        energy_spec_for,
        pallas_mjhmc_stream_run,
    )

    dist = RoughWell(ndims=2)
    spec = energy_spec_for(dist)
    n, s = 1024, 8
    l = n // s
    x = dist.init_x(jax.random.key(0), n).reshape(2, s, l)
    v = jax.random.normal(jax.random.key(1), x.shape, jnp.float32)
    u, g = dist.potential_and_grad(x.reshape(2, n))
    args = (
        spec, x, v, g.reshape(2, s, l), u.reshape(s, l),
        jnp.zeros((s, l)), jnp.zeros((s, l)),
        jnp.int32(7), jnp.float32(1.0), jnp.float32(0.1), 20, 1, 10,
    )
    ip = pltpu.InterpretParams()
    m = 10
    xs, ws, es, out = pallas_mjhmc_stream_run(*args, interpret=ip)
    assert es.dtype == jnp.int32 and es.shape == (20, s, l)
    expect = np.broadcast_to(
        (np.arange(1, 21) * m + m)[:, None, None], (20, s, l)
    )
    np.testing.assert_array_equal(np.asarray(es), expect)
    np.testing.assert_array_equal(np.asarray(es[-1]), np.asarray(out.evals))

    _, _, es_c, out_c = pallas_mjhmc_stream_run(
        *args, interpret=ip, variant="control"
    )
    np.testing.assert_array_equal(
        np.asarray(es_c),
        np.broadcast_to((np.arange(1, 21) * m)[:, None, None], (20, s, l)),
    )
    np.testing.assert_array_equal(np.asarray(es_c[-1]), np.asarray(out_c.evals))


@pytest.mark.skipif(not ON_TPU, reason="Mosaic kernel requires TPU")
def test_engine_exact_evals_axis_matches_xla_at_bursty_beta():
    """The engine autocorrelation path must use the same EXACT cumulative
    counter axis as the XLA path (VERDICT r3 item 4) — pinned at a small
    (bursty) β where rare 2M cache rebuilds make the mean-rate mapping the
    round-3 code used misalign. Receipts: per-emission counter increments
    are multiples of M with both M and 2M present, and the engine decay
    agrees with the XLA path's exact-axis decay within MC error."""
    from mjhmc_tpu.experiments.autocorr_experiment import (
        calculate_autocorrelation,
    )
    from mjhmc_tpu.ops.pallas_mjhmc import PallasMJHMC

    dist = RoughWell(ndims=2)
    m = 10
    # ε in the tuned ballistic band (the claim battery's rough-well optima
    # sit at 4-10); β=0.02 is the burstiest point whose curve still decays
    # inside the window on this target (≈2% of iterations pay the 2M
    # rebuild — the mechanism under test; at β ≤ 2e-3 the chain itself is
    # too persistent to decay in any reasonable window, on BOTH paths)
    kw = dict(epsilon=4.0, beta=0.02, num_leapfrog_steps=m)

    eng = PallasMJHMC(dist, nbatch=2048, seed=11, **kw)
    eng.run(300)
    _, _, es = eng.sample(400, return_evals=True)
    inc = np.diff(np.asarray(es, np.int64), axis=0)
    assert (inc % m == 0).all() and inc.min() >= m and inc.max() <= 2 * m
    assert (inc == 2 * m).any()  # rebuilds do appear in the stream

    ac_eng = calculate_autocorrelation(
        dist, "mjhmc", num_steps=2500, nbatch=2048, nlags=500,
        seed=0, engine="pallas", **kw,
    )
    ac_xla = calculate_autocorrelation(
        dist, "mjhmc", num_steps=2500, nbatch=2048, nlags=500,
        seed=1, engine="xla", **kw,
    )
    assert not ac_eng.censored and not ac_xla.censored
    # same axis construction, independent streams: decays agree within MC
    assert abs(ac_eng.decay_evals / ac_xla.decay_evals - 1.0) < 0.3, (
        ac_eng.decay_evals, ac_xla.decay_evals,
    )


def test_interpret_mode_two_stage_counters_and_semantics():
    """CPU pin of the two-stage engine integrator (VERDICT r3 item 10).

    Deterministic interpret mode: MJHMC at integrator='two_stage' must
    charge exactly 2M·steps + 2M evals per chain (2 evals per integrator
    step, ops/leapfrog.py INTEGRATORS; + the one fresh backward rebuild),
    control exactly 2M·steps with Σweight = steps. And the control
    variant's deterministic trajectory must MATCH ops.leapfrog.two_stage
    run on the same inits with the same corrupted momentum — the kernel
    body is the same BCSS splitting."""
    from jax.experimental.pallas import tpu as pltpu

    from mjhmc_tpu.ops.leapfrog import two_stage
    from mjhmc_tpu.ops.pallas_mjhmc import (
        energy_spec_for,
        pallas_mjhmc_run,
    )

    dist = RoughWell(ndims=2)
    spec = energy_spec_for(dist)
    n, s = 1024, 8
    l = n // s
    x = dist.init_x(jax.random.key(0), n).reshape(2, s, l)
    v = jax.random.normal(jax.random.key(1), x.shape, jnp.float32)
    u, g = dist.potential_and_grad(x.reshape(2, n))
    steps, m = 50, 5
    args = (
        spec, x, v, g.reshape(2, s, l), u.reshape(s, l),
        jnp.zeros((s, l)), jnp.zeros((s, l)),
        jnp.int32(7), jnp.float32(0.4), jnp.float32(0.1), steps, m,
    )
    ip = pltpu.InterpretParams()
    out = pallas_mjhmc_run(*args, interpret=ip, integrator="two_stage")
    np.testing.assert_array_equal(
        np.asarray(out.evals), 2 * m * steps + 2 * m
    )

    out_c = pallas_mjhmc_run(
        *args, interpret=ip, variant="control", integrator="two_stage"
    )
    np.testing.assert_array_equal(np.asarray(out_c.evals), 2 * m * steps)
    np.testing.assert_array_equal(np.asarray(out_c.w), float(steps))

    # one-step control trajectory == ops.leapfrog.two_stage on the same
    # corrupted momentum (interpret PRNG ⟹ xi is the deterministic
    # Box-Muller of ~zero bits; replicate it host-side)
    one = pallas_mjhmc_run(
        *args[:10], 1, m, interpret=ip, variant="control",
        integrator="two_stage",
    )
    u24 = 0.5 / (1 << 24)  # _uniform of zero PRNG bits
    r = np.sqrt(-2.0 * np.log(u24))
    xi = np.float32(r * np.cos(2.0 * np.pi * u24))
    beta = 0.1
    v_corr = np.sqrt(1 - beta) * np.asarray(v) + np.sqrt(beta) * xi
    xf, vf, _, _ = two_stage(
        lambda xx: dist.potential_and_grad(xx),
        x.reshape(2, n), jnp.asarray(v_corr).reshape(2, n),
        g, jnp.float32(0.4), m,
    )
    np.testing.assert_allclose(
        np.asarray(one.x).reshape(2, n), np.asarray(xf), rtol=2e-5, atol=2e-5
    )
