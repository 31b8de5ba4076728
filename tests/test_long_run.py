"""Checkpointed long runs: kill/resume equals uninterrupted execution."""

import jax
import numpy as np

from mjhmc_tpu.models import Gaussian
from mjhmc_tpu.samplers import MarkovJumpHMC
from mjhmc_tpu.utils.long_run import run_with_checkpoints


def test_resume_equals_uninterrupted(tmp_path):
    dist = Gaussian(ndims=2, log_conditioning=1.0)

    def fresh():
        return MarkovJumpHMC(
            dist, epsilon=0.5, beta=0.2, num_leapfrog_steps=5, nbatch=32, seed=7
        )

    # uninterrupted 40 steps
    a = fresh()
    info_a = run_with_checkpoints(a, 40, 10, str(tmp_path / "a.npz"))
    assert info_a["steps_run"] == 40

    # interrupted: run 20, "crash", resume from checkpoint to 40
    b = fresh()
    run_with_checkpoints(b, 20, 10, str(tmp_path / "b.npz"))
    c = fresh()  # new process simulation
    info_c = run_with_checkpoints(c, 40, 10, str(tmp_path / "b.npz"))
    assert info_c["resumed_from"] == 20 and info_c["steps_run"] == 20

    np.testing.assert_array_equal(
        np.asarray(a.state.chain.x), np.asarray(c.state.chain.x)
    )
    np.testing.assert_array_equal(
        np.asarray(a.state.grad_evals), np.asarray(c.state.grad_evals)
    )


def test_empirical_spectral_gap_ar1():
    """Empirical gap estimator recovers 1-φ on an AR(1) chain."""
    from mjhmc_tpu.diagnostics import empirical_spectral_gap
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    t, n, phi = 4096, 64, 0.9
    x = np.zeros((t, 1, n), np.float32)
    eps = rng.standard_normal((t, 1, n)) * np.sqrt(1 - phi**2)
    for i in range(1, t):
        x[i] = phi * x[i - 1] + eps[i]
    gap = empirical_spectral_gap(jnp.asarray(x))
    assert abs(gap - (1 - phi)) < 0.04, gap
