"""Worker process for tests/test_multiprocess.py.

Runs the chain-sharded sampler + explicit collectives across a REAL
``jax.distributed`` process group on CPU (gloo collectives), per the test
strategy in SURVEY.md §4.5: "jax.distributed multi-process CPU tests for
the collective paths (sharded moments, SMC resampling)". The virtual
8-device mesh used everywhere else exercises GSPMD partitioning but not
actual cross-process transport; this does.

Invoked as:  python tests/multiprocess_worker.py PORT PROCESS_ID NPROC NDEV

Every process deterministically reconstructs the FULL global inputs (same
seeds), so each can compute the single-process reference locally and check
the cross-process sharded result against it — no inter-process comparison
channel needed beyond the collectives under test themselves.
"""

import os
import sys


def main() -> int:
    port, pid, nproc, ndev = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    # Do not inherit the test-suite XLA_FLAGS (it forces 8 local devices);
    # each worker contributes exactly `ndev` devices to the global mesh.
    os.environ.pop("XLA_FLAGS", None)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", ndev)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc * ndev

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mjhmc_tpu.inference.smc import systematic_resample
    from mjhmc_tpu.models.rough_well import RoughWell
    from mjhmc_tpu.parallel.collectives import (
        distributed_systematic_resample,
        sharded_moments,
    )
    from mjhmc_tpu.parallel.mesh import chain_sharding, make_chain_mesh
    from mjhmc_tpu.samplers.mjhmc import mjhmc_run
    from mjhmc_tpu.samplers.state import make_mj_state

    mesh = make_chain_mesh()
    nbatch = 64

    def globalize(leaf):
        """Lift a (fully known, identical-on-every-process) array onto the
        cross-process mesh, chain axis sharded."""
        arr = np.asarray(leaf)
        if arr.ndim >= 1 and arr.shape[-1] == nbatch:
            sh = chain_sharding(mesh, arr.ndim)
        else:
            sh = NamedSharding(mesh, P())
        return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])

    # ---- 1) sampler hot loop across processes, checked vs local run ----
    dist = RoughWell()
    state = make_mj_state(dist, jax.random.key(0), nbatch)  # process-local, full
    gstate = jax.tree_util.tree_map(globalize, state)
    key = jax.random.key(7)
    args = dict(num_steps=25, epsilon=0.5, beta=0.2, num_leapfrog_steps=5)

    def run(s, k):
        return mjhmc_run(dist, s, k, collect="stats", **args)

    ref, _ = jax.jit(run)(state, key)  # single-process reference
    gout, _ = jax.jit(run)(gstate, key)  # same program, cross-process mesh

    # global eval counters must match the local reference exactly
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(gout.grad_evals)
    ref_total = int(np.asarray(ref.grad_evals).sum())
    assert int(np.asarray(total)) == ref_total, (int(np.asarray(total)), ref_total)

    # dwell-weighted spatial moments via the explicit psum path
    mean_g, var_g = sharded_moments(gout.chain.x, gout.dwell_sum, mesh)
    w = np.asarray(ref.dwell_sum)
    x = np.asarray(ref.chain.x)
    mean_ref = (w * x).sum(axis=1) / w.sum()
    var_ref = (w * x * x).sum(axis=1) / w.sum() - mean_ref**2
    np.testing.assert_allclose(np.asarray(mean_g), mean_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(var_g), var_ref, rtol=1e-4, atol=1e-4)

    # ---- 2) distributed systematic resample == single-device version ----
    rng = np.random.default_rng(3)
    xp = rng.normal(size=(3, nbatch)).astype(np.float32)
    lw = rng.normal(size=(nbatch,)).astype(np.float32)
    k2 = jax.random.key(11)
    expect = np.asarray(systematic_resample(k2, jnp.asarray(xp), jnp.asarray(lw)))
    # jit the shard_map: eager dispatch would index non-addressable shards
    got = jax.jit(
        lambda k, x_, lw_: distributed_systematic_resample(k, x_, lw_, mesh)
    )(k2, globalize(xp), globalize(lw))
    for shard in got.addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data), expect[shard.index])

    # ---- 3) multi-host-safe checkpoint: bit-exact resume across the ----
    # process boundary (SURVEY.md §5 checkpoint row, pod semantics)
    import tempfile

    from mjhmc_tpu.utils.checkpoint import (
        load_sharded_pytree,
        save_sharded_pytree,
    )

    ckdir = os.path.join(tempfile.gettempdir(), f"mjhmc_ck_{port}")
    os.makedirs(ckdir, exist_ok=True)
    prefix = os.path.join(ckdir, "carry")
    k_a, k_b = jax.random.key(21), jax.random.key(22)
    seg1, _ = jax.jit(run)(gstate, k_a)
    save_sharded_pytree(prefix, seg1)
    restored = load_sharded_pytree(prefix, jax.tree_util.tree_map(globalize, state))
    # leaves restored onto the same mesh, matched by shard index
    resumed, _ = jax.jit(run)(restored, k_b)
    direct, _ = jax.jit(run)(seg1, k_b)
    for a, b in zip(
        jax.tree_util.tree_leaves(resumed), jax.tree_util.tree_leaves(direct)
    ):
        if jax.dtypes.issubdtype(getattr(a, "dtype", None), jax.dtypes.prng_key):
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        for sa, sb in zip(a.addressable_shards, b.addressable_shards):
            np.testing.assert_array_equal(np.asarray(sa.data), np.asarray(sb.data))

    # ---- 4) SMC stages across processes (reweight → systematic resample
    # → HMC mutation; the resample's global CDF spans the process
    # boundary under GSPMD) vs the identical single-process program ------
    from mjhmc_tpu.inference.smc import SMCState, smc_stage

    k_i, k_r = jax.random.split(jax.random.key(33))
    x0 = 3.0 * jax.random.normal(k_i, (dist.ndims, nbatch), jnp.float32)
    smc0 = SMCState(
        x=np.asarray(x0),
        log_w=np.zeros((nbatch,), np.float32),
        lam=np.float32(0.0),
        log_z=np.float32(0.0),
        eps=np.float32(0.25),
        key=k_r,
        log_tau=np.float32(0.0),
        chees_m=np.float32(0.0),
        chees_v=np.float32(0.0),
        chees_step=np.int32(0),
    )

    def smc3(s, mesh=None):
        def body(s, _):
            s, out = smc_stage(dist, s, 3.0, 0.5, 3, 5, mesh=mesh)
            return s, out

        return jax.lax.scan(body, s, None, length=3)

    s_ref, o_ref = jax.jit(smc3)(smc0)
    gsmc0 = jax.tree_util.tree_map(
        lambda a: globalize(a) if not jax.dtypes.issubdtype(
            getattr(a, "dtype", None), jax.dtypes.prng_key
        ) else a,
        smc0,
    )
    s_g, o_g = jax.jit(lambda s: smc3(s, mesh=mesh))(gsmc0)
    np.testing.assert_allclose(
        np.asarray(o_g.lam), np.asarray(o_ref.lam), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        float(s_g.log_z), float(s_ref.log_z), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(o_g.ess), np.asarray(o_ref.ess), rtol=1e-3
    )

    # ---- 5) chain-sharded NUTS (per-shard early exit) across processes,
    # checked BIT-LEVEL against local per-shard replication: shard s of
    # ``sharded_nuts_run`` runs ``nuts_run`` on its slice with
    # ``fold_in(key, s)`` — every process reconstructs that exact program
    # locally, so counters must match exactly and trajectories to float
    # tolerance (VERDICT r3 item 5: shard_map/while_loop interactions are
    # only proven where bytes actually cross a process boundary). --------
    from mjhmc_tpu.samplers.nuts import (
        NUTSState,
        make_nuts_state,
        nuts_run,
        sharded_nuts_run,
    )

    nsteps, md, eps_n = 10, 4, 0.5
    nst = make_nuts_state(dist, jax.random.key(41), nbatch)
    key_n = jax.random.key(42)
    gnst = jax.tree_util.tree_map(globalize, nst)
    gs_n, gouts_n = jax.jit(
        lambda s: sharded_nuts_run(
            mesh, dist, s, key_n, nsteps, eps_n, max_depth=md
        )
    )(gnst)

    nshards = nproc * ndev
    per = nbatch // nshards
    ref_ge = np.zeros((nbatch,), np.int32)
    ref_xs = np.zeros((nsteps, dist.ndims, nbatch), np.float32)
    ref_ev = np.zeros((nsteps, nshards), np.float32)
    for sidx in range(nshards):
        sl = slice(sidx * per, (sidx + 1) * per)
        st_s = NUTSState(
            x=jnp.asarray(np.asarray(nst.x)[:, sl]),
            u=jnp.asarray(np.asarray(nst.u)[sl]),
            grad=jnp.asarray(np.asarray(nst.grad)[:, sl]),
            grad_evals=jnp.asarray(np.asarray(nst.grad_evals)[sl]),
        )
        s_end, o = jax.jit(
            lambda s, k: nuts_run(dist, s, k, nsteps, eps_n, max_depth=md)
        )(st_s, jax.random.fold_in(key_n, sidx))
        ref_ge[sl] = np.asarray(s_end.grad_evals)
        ref_xs[:, :, sl] = np.asarray(o["x"])
        ref_ev[:, sidx] = np.asarray(o["evals_mean"])

    # per-chain leaf counters: ≥ 1 leaf per iteration, ≤ the 2^md−1 budget
    for shard in gs_n.grad_evals.addressable_shards:
        got = np.asarray(shard.data)
        assert got.min() >= nsteps and got.max() <= nsteps * (2**md - 1)
        np.testing.assert_array_equal(got, ref_ge[shard.index])
    for shard in gouts_n["x"].addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data), ref_xs[shard.index], rtol=1e-4, atol=1e-4
        )
    for shard in gouts_n["evals_mean_shards"].addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data), ref_ev[shard.index], rtol=1e-5, atol=1e-5
        )

    # ---- 6) 2-D chains×model mesh across processes: the tensor-parallel
    # sparse-coding energy (psum over the model axis crosses the process
    # boundary) vs the dense single-process computation, then a full MJHMC
    # run on that mesh vs the unsharded reference program. --------------
    from mjhmc_tpu.models.sparse_coding import SparseCoding
    from mjhmc_tpu.parallel.mesh import make_chain_mesh
    from mjhmc_tpu.parallel.model_parallel import ModelShardedSparseCoding

    mesh2 = make_chain_mesh(nproc * ndev, model_axis=2)
    sc_plain = SparseCoding(npixels=64, nbasis=128)
    sc = ModelShardedSparseCoding(sc_plain, mesh2)
    nb2 = 8

    def globalize2(leaf):
        arr = np.asarray(leaf)
        if arr.ndim >= 2 and arr.shape[-1] == nb2 and arr.shape[-2] == sc_plain.ndims:
            spec = P(*([None] * (arr.ndim - 2)), "model", "chains")
        elif arr.ndim >= 1 and arr.shape[-1] == nb2:
            spec = P(*([None] * (arr.ndim - 1)), "chains")
        else:
            spec = P()
        return jax.make_array_from_callback(
            arr.shape, NamedSharding(mesh2, spec), lambda idx: arr[idx]
        )

    a0 = np.asarray(sc_plain.init_x(jax.random.key(51), nb2), np.float32)
    u_ref2, g_ref2 = sc_plain.potential_and_grad(jnp.asarray(a0))
    u_g2, g_g2 = jax.jit(sc.potential_and_grad)(globalize2(a0))
    for shard in u_g2.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data), np.asarray(u_ref2)[shard.index],
            rtol=1e-4, atol=1e-4,
        )
    for shard in g_g2.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data), np.asarray(g_ref2)[shard.index],
            rtol=1e-4, atol=1e-4,
        )

    st_sc = make_mj_state(sc_plain, jax.random.key(52), nb2)
    k_sc = jax.random.key(53)
    args_sc = dict(num_steps=3, epsilon=0.02, beta=0.1, num_leapfrog_steps=2)
    ref_sc, rout_sc = jax.jit(
        lambda s, k: mjhmc_run(sc_plain, s, k, **args_sc)
    )(st_sc, k_sc)
    gsc, gout_sc = jax.jit(
        lambda s, k: mjhmc_run(sc, s, k, **args_sc)
    )(jax.tree_util.tree_map(globalize2, st_sc), k_sc)
    ref_dwell = np.asarray(rout_sc["dwell"])
    for shard in gout_sc["dwell"].addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data), ref_dwell[shard.index],
            rtol=2e-3, atol=1e-5,
        )
    total_sc = jax.jit(
        jnp.sum, out_shardings=NamedSharding(mesh2, P())
    )(gsc.grad_evals)
    assert int(np.asarray(total_sc)) == int(
        np.asarray(ref_sc.grad_evals).sum()
    )

    print(f"WORKER OK pid={pid} devices={len(jax.devices())}", flush=True)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
