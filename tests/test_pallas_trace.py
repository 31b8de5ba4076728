"""CPU trace-level coverage of every fused-engine entry point.

``pl.pallas_call`` traces its kernel to a jaxpr at *trace* time, which is
backend-independent — so ``jax.eval_shape`` on the kernel wrappers runs the
full kernel Python (ref unpacking, mass/stream branches, DMA plumbing,
output writes) without needing a TPU. This is the regression net for
refactors that break a rarely-exercised (wrapper × has_mass) combination:
the round-2 preconditioning refactor left a stale ``_write_outs`` call in
``_mjhmc_stream_kernel`` that only a real-TPU streaming run would have hit.
"""

import jax
import jax.numpy as jnp
import pytest

from mjhmc_tpu.models import EightSchools, ProductOfT, RoughWell
from mjhmc_tpu.ops.pallas_mjhmc import (
    energy_spec_for,
    pallas_mjhmc_mm_run,
    pallas_mjhmc_mm_stream_run,
    pallas_mjhmc_run,
    pallas_mjhmc_stream_run,
)


def _elementwise_args(dist=None, n=1024):
    # EightSchools covers the generalized (2d-row) params plumbing
    dist = dist or RoughWell(ndims=2)
    d = dist.ndims
    spec = energy_spec_for(dist)
    s, l = 8, n // 8
    dv = jax.ShapeDtypeStruct((d, s, l), jnp.float32)
    sv = jax.ShapeDtypeStruct((s, l), jnp.float32)
    sc = jax.ShapeDtypeStruct((), jnp.float32)
    return spec, (dv, dv, dv, sv, sv, sv,
                  jax.ShapeDtypeStruct((), jnp.int32), sc, sc), d


def _matmul_args(n=128):
    dist = ProductOfT(ndims=36, nbasis=36)
    spec = energy_spec_for(dist)
    d = dist.ndims
    dv = jax.ShapeDtypeStruct((d, n), jnp.float32)
    sv = jax.ShapeDtypeStruct((1, n), jnp.float32)
    sc = jax.ShapeDtypeStruct((), jnp.float32)
    return spec, (dv, dv, dv, sv, sv, sv,
                  jax.ShapeDtypeStruct((), jnp.int32), sc, sc), d


@pytest.mark.parametrize("with_mass", [False, True])
@pytest.mark.parametrize("dist_cls", [RoughWell, EightSchools])
def test_elementwise_run_traces(with_mass, dist_cls):
    spec, args, d = _elementwise_args(dist_cls())
    inv_mass = jnp.ones((d,), jnp.float32) if with_mass else None
    out = jax.eval_shape(
        lambda *a: pallas_mjhmc_run(
            spec, *a, num_steps=4, num_leapfrog=3, inv_mass=inv_mass
        ),
        *args,
    )
    assert out.x.shape == args[0].shape


@pytest.mark.parametrize("with_mass", [False, True])
@pytest.mark.parametrize("dist_cls", [RoughWell, EightSchools])
def test_elementwise_stream_traces(with_mass, dist_cls):
    spec, args, d = _elementwise_args(dist_cls())
    inv_mass = jnp.ones((d,), jnp.float32) if with_mass else None
    xs, ws, es, out = jax.eval_shape(
        lambda *a: pallas_mjhmc_stream_run(
            spec, *a, num_emits=4, thin=2, num_leapfrog=3, inv_mass=inv_mass
        ),
        *args,
    )
    assert xs.shape == (4,) + args[0].shape
    assert ws.shape == (4,) + args[3].shape
    assert es.shape == (4,) + args[3].shape and es.dtype == jnp.int32
    assert out.x.shape == args[0].shape


@pytest.mark.parametrize("with_mass", [False, True])
def test_matmul_run_traces(with_mass):
    spec, args, d = _matmul_args()
    inv_mass = jnp.ones((d,), jnp.float32) if with_mass else None
    out = jax.eval_shape(
        lambda *a: pallas_mjhmc_mm_run(
            spec, *a, num_steps=4, num_leapfrog=3, inv_mass=inv_mass
        ),
        *args,
    )
    assert out.x.shape == args[0].shape


@pytest.mark.parametrize("with_mass", [False, True])
def test_matmul_stream_traces(with_mass):
    spec, args, d = _matmul_args()
    inv_mass = jnp.ones((d,), jnp.float32) if with_mass else None
    xs, ws, es, out = jax.eval_shape(
        lambda *a: pallas_mjhmc_mm_stream_run(
            spec, *a, num_emits=4, thin=2, num_leapfrog=3, inv_mass=inv_mass
        ),
        *args,
    )
    assert xs.shape == (4, d, args[0].shape[1])
    assert es.shape == (4, 1, args[0].shape[1]) and es.dtype == jnp.int32
    assert out.x.shape == args[0].shape
