"""ChEES trajectory-length adaptation tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mjhmc_tpu.models import Gaussian
from mjhmc_tpu.ops.leapfrog import leapfrog, masked_leapfrog
from mjhmc_tpu.samplers import make_hmc_state
from mjhmc_tpu.samplers.chees import chees_hmc_run


def test_masked_leapfrog_matches_unmasked():
    dist = Gaussian(ndims=3, log_conditioning=1.0)
    x = dist.init_x(jax.random.key(0), 16)
    v = jax.random.normal(jax.random.key(1), x.shape)
    u, g = dist.potential_and_grad(x)

    m_uniform = jnp.full((16,), 7, jnp.int32)
    xa, va, ua, ga, steps = masked_leapfrog(
        dist.potential_and_grad, x, v, g, 0.2, 10, m_uniform, u0=u
    )
    xb, vb, ub, gb = leapfrog(dist.potential_and_grad, x, v, g, 0.2, 7)
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(steps), 7)


def test_masked_leapfrog_per_chain_lengths():
    """Chain with m_i=k must equal a dedicated k-step integration."""
    dist = Gaussian(ndims=2, log_conditioning=0.5)
    n = 4
    x = dist.init_x(jax.random.key(2), n)
    v = jax.random.normal(jax.random.key(3), x.shape)
    u, g = dist.potential_and_grad(x)
    m_i = jnp.array([1, 3, 5, 8], jnp.int32)
    xa, va, _, _, steps = masked_leapfrog(
        dist.potential_and_grad, x, v, g, 0.3, 8, m_i, u0=u
    )
    np.testing.assert_array_equal(np.asarray(steps), [1, 3, 5, 8])
    for c, k in enumerate([1, 3, 5, 8]):
        xe, ve, _, _ = leapfrog(
            dist.potential_and_grad, x[:, c : c + 1], v[:, c : c + 1],
            g[:, c : c + 1], 0.3, k,
        )
        np.testing.assert_allclose(
            np.asarray(xa[:, c]), np.asarray(xe[:, 0]), rtol=1e-4, atol=1e-5
        )


def test_chees_adapts_tau_toward_scale():
    """On N(0, σ²I) the optimal integration time is O(σ); starting from a
    far-too-short τ, ChEES must grow it substantially."""
    dist = Gaussian(ndims=8, log_conditioning=2.0)  # σ_max = 10
    state = make_hmc_state(dist, jax.random.key(4), 512)
    run = jax.jit(
        lambda s, k: chees_hmc_run(
            dist, s, k, 600, max_leapfrog_steps=64, tau0=0.1, eps0=0.3
        )
    )
    state, cs, da, trace = run(state, jax.random.key(5))
    tau_final = float(np.asarray(trace["tau"])[-50:].mean())
    assert tau_final > 1.0, tau_final  # grew by >10x toward O(σ_max)
    acc = float(np.asarray(trace["accept"])[-100:].mean())
    assert 0.4 < acc < 0.95, acc
    # sampler stays correct under adaptation
    xs_var = np.asarray(state.chain.x).var(axis=1)
    tgt = np.asarray(dist.analytic_var())
    assert (xs_var > 0.2 * tgt).all() and (xs_var < 5 * tgt).all()
