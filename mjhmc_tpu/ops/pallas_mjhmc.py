"""Fused Pallas MJHMC engine — the speed-of-light path for small-state
energies (SURVEY.md §7 hard part #2: ≥1M leapfrog steps/s/chip on a 2-D
state; the XLA scan path already exceeds it ~700×, this kernel removes the
remaining per-op dispatch overhead).

One ``pallas_call`` executes the ENTIRE sampling run: the steps-loop, both
fused leapfrog trajectories (forward + backward for the cache rebuild),
transition rates, Gumbel-max clock selection, momentum refresh, the cache
state machine, dwell-weighted moment accumulators and eval counters — all
in VMEM with the on-core PRNG (`pltpu.prng_random_bits`). Zero HBM traffic
per step beyond the initial/final state, zero kernel launches per step.

Scope: all five BASELINE configs. Elementwise-separable energies (rough
well, diagonal Gaussian — configs 1, 2, 4) use a (d, 8, L) layout so tiny
d still fills the sublanes. Matmul energies (product-of-t, sparse coding
— configs 3, 5) use a 2-D (d, lanes) layout with per-chain scalars as
(1, lanes); the basis/dictionary matrices are whole-array VMEM inputs and
the contractions run on the MXU inside the same fused steps-loop, so the
chain state never touches HBM between iterations.

Layout: chains are reshaped (d, n) → (d, 8, n/8) so the (sublane, lane)
tile is fully occupied even for d=2 (the plain (2, n) layout wastes 6/8
sublanes). n must be a multiple of 1024; wrappers pad by running extra
chains (independent chains — more samples, no bias).

Semantics match ``samplers.mjhmc.mjhmc_step`` exactly except the PRNG
stream (on-core PRNG vs threefry), so agreement is distributional; the
jnp path remains the bit-reproducible reference.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mjhmc_tpu.models.gaussian import Gaussian
from mjhmc_tpu.models.product_of_t import ProductOfT
from mjhmc_tpu.models.rough_well import RoughWell
from mjhmc_tpu.models.sparse_coding import SparseCoding

Array = jax.Array

LOG_RATE_MAX = 25.0
NEG_INF = -1e30
_SUBLANES = 8
_LANES = 128


# --------------------------------------------------------------------------
# static energy specs: emit per-dim gradient / summed potential jnp code
# --------------------------------------------------------------------------
class EnergySpec:
    """Inline energy codegen for the kernel.

    Scalar hyperparameters are baked in statically; *per-dim* parameter
    vectors arrive through the ``params`` kernel input (Pallas kernels may
    not capture array constants), shaped like the state block (d, S, L).
    """

    #: per-dim parameter vector shipped to the kernel, shape (d,) — ones
    #: when the spec has no per-dim parameters
    def param_vector(self, ndims: int) -> np.ndarray:
        return np.ones((ndims,), np.float32)

    def du(self, x, params):  # (d, S, L) -> (d, S, L)
        raise NotImplementedError

    def u_sum(self, x, params):  # (d, S, L) -> (S, L)
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class RoughWellSpec(EnergySpec):
    scale1: float
    scale2: float
    amplitude: float = 1.0

    def du(self, x, params):
        return x * (1.0 / self.scale1**2) - jnp.sin(x * (1.0 / self.scale2)) * (
            self.amplitude / self.scale2
        )

    def u_sum(self, x, params):
        return jnp.sum(
            x * x * (0.5 / self.scale1**2)
            + self.amplitude * jnp.cos(x * (1.0 / self.scale2)),
            axis=0,
        )


@dataclasses.dataclass(frozen=True)
class GaussianSpec(EnergySpec):
    precisions: tuple  # per-dim 1/σ²

    def param_vector(self, ndims: int) -> np.ndarray:
        return np.asarray(self.precisions, np.float32)

    def du(self, x, params):
        return x * params

    def u_sum(self, x, params):
        return 0.5 * jnp.sum(x * x * params, axis=0)


class MatmulEnergySpec(EnergySpec):
    """Energy with basis/dictionary contractions on the MXU.

    State layout is 2-D (d, lanes); per-chain scalars are (1, lanes).
    Parameter matrices arrive as separate whole-array VMEM refs (Pallas
    kernels may not capture array constants): ``param_arrays()`` lists
    them; ``du``/``u_sum`` receive them positionally after ``x``.

    Specs hold the (frozen, hashable) distribution so they can serve as
    jit static args while the arrays themselves ride the input path.
    """

    def param_arrays(self) -> list:
        raise NotImplementedError

    #: rows of k-sized matmul temporaries alive per lane (VMEM budgeting)
    def aux_rows(self) -> int:
        raise NotImplementedError


_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,  # 1 bf16 pass — what the XLA
    # path's einsums use on TPU (models/*.py, preferred f32 accumulate)
    "highest": jax.lax.Precision.HIGHEST,  # 6 passes, full f32
    # (Mosaic's dot lowering supports only these two)
}


@dataclasses.dataclass(frozen=True)
class ProductOfTSpec(MatmulEnergySpec):
    """precision='default' matches the XLA path's TPU einsum precision
    (one bf16 pass, f32 accumulate); measured statistically equivalent
    (dwell/evals/moments within MC error) and ~35% faster than 'highest'."""

    dist: ProductOfT
    precision: str = "default"

    def param_arrays(self):
        return [np.asarray(self.dist._basis, np.float32)]  # W: (d, k)

    def aux_rows(self) -> int:
        return self.dist.nbasis

    def _dot(self, a, b, dims):
        return jax.lax.dot_general(
            a, b, (dims, ((), ())),
            precision=_PRECISIONS[self.precision],
            preferred_element_type=jnp.float32,
        )

    def _y(self, x, w):  # Wᵀx: (k, lanes)
        return self._dot(w, x, ((0,), (0,)))

    def du(self, x, w):
        nu = self.dist.nu
        y = self._y(x, w)
        dudy = (nu + 1.0) * y / (nu + y * y)
        return self._dot(w, dudy, ((1,), (0,)))

    def u_sum(self, x, w):
        nu = self.dist.nu
        y = self._y(x, w)
        return 0.5 * (nu + 1.0) * jnp.sum(
            jnp.log1p(y * y * (1.0 / nu)), axis=0, keepdims=True
        )


@dataclasses.dataclass(frozen=True)
class SparseCodingSpec(MatmulEnergySpec):
    """precision defaults to full f32: the fit term ½σ⁻²‖x−Φa‖² amplifies
    reconstruction error by σ⁻² (=100 at the benchmark σ=0.1), and bf16
    residuals measurably shift the dwell mass (~2.5%). Set 'default' to
    trade that bias for ~40% more throughput."""

    dist: SparseCoding
    precision: str = "highest"

    def param_arrays(self):
        # host-side numpy only: this runs under an active jit trace, so the
        # jnp-built .patch property (a Tracer there) must not be touched
        d = self.dist
        patch = (
            np.asarray(d.custom_patch, np.float32)
            if d.custom_patch is not None
            else d._patch
        )
        return [
            np.asarray(d._phi, np.float32),  # Φ: (p, b)
            patch.reshape(-1, 1).astype(np.float32),  # (p, 1)
        ]

    def aux_rows(self) -> int:
        return self.dist.npixels

    def _dot(self, a, b, dims):
        return jax.lax.dot_general(
            a, b, (dims, ((), ())),
            precision=_PRECISIONS[self.precision],
            preferred_element_type=jnp.float32,
        )

    def _resid(self, a, phi, patch):  # patch − Φa: (p, lanes)
        return patch - self._dot(phi, a, ((1,), (0,)))

    def du(self, a, phi, patch):
        d = self.dist
        s = jnp.sqrt(a * a + d.smooth_eps)
        r = self._resid(a, phi, patch)
        return d.lam * (a / s) - (1.0 / d.sigma**2) * self._dot(
            phi, r, ((0,), (0,))
        )

    def u_sum(self, a, phi, patch):
        d = self.dist
        s = jnp.sqrt(a * a + d.smooth_eps)
        r = self._resid(a, phi, patch)
        return d.lam * jnp.sum(s, axis=0, keepdims=True) + (
            0.5 / d.sigma**2
        ) * jnp.sum(r * r, axis=0, keepdims=True)


def energy_spec_for(dist) -> EnergySpec:
    if isinstance(dist, RoughWell):
        return RoughWellSpec(dist.scale1, dist.scale2, dist.amplitude)
    if isinstance(dist, Gaussian):
        return GaussianSpec(tuple(float(v) for v in 1.0 / dist.variances))
    if isinstance(dist, ProductOfT):
        return ProductOfTSpec(dist)
    if isinstance(dist, SparseCoding):
        return SparseCodingSpec(dist)
    raise TypeError(
        f"no fused Pallas energy for {type(dist).__name__}; use the XLA path"
    )


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------
def _uniform(shape):
    """U(0,1) from raw PRNG bits, strictly positive (safe for log).

    ``prng_random_bits`` yields *signed* int32 on TPU; a plain ``>>`` would
    sign-extend, so use a logical shift for the top 24 bits.
    """
    bits = pltpu.prng_random_bits(shape)
    u = jax.lax.shift_right_logical(bits, 8).astype(jnp.float32) * (
        1.0 / (1 << 24)
    )
    return u + (0.5 / (1 << 24))


def _gumbel(shape):
    return -jnp.log(-jnp.log(_uniform(shape)))


def _normal(shape):
    """Box-Muller from two uniforms."""
    u1 = _uniform(shape)
    u2 = _uniform(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos((2.0 * np.pi) * u2)


def _make_step(spec: EnergySpec, params, eps, beta, m):
    """Build the fused jump-iteration body shared by both kernels.

    Returns step(carry) -> (carry', (x_pre, dwell)) where x_pre/dwell are
    the Rao-Blackwell emission of that iteration.
    """

    def leapfrog_pair(x, vf, gf, vb, gb):
        """M steps forward from (x, vf) and backward from (x, vb=-v)."""
        xf, xb = x, x
        for _ in range(m):
            vf_h = vf - (0.5 * eps) * gf
            xf = xf + eps * vf_h
            gf = spec.du(xf, params)
            vf = vf_h - (0.5 * eps) * gf

            vb_h = vb - (0.5 * eps) * gb
            xb = xb + eps * vb_h
            gb = spec.du(xb, params)
            vb = vb_h - (0.5 * eps) * gb
        return xf, vf, gf, xb, vb, gb

    def halfsq(v):
        return 0.5 * jnp.sum(v * v, axis=0)

    def step(carry):
        x, v, g, u, h_back, valid, w, wx, wx2, evals = carry
        h_cur = u + halfsq(v)

        xf, vf, gf, xb, vb, gb = leapfrog_pair(x, v, g, -v, g)
        uf = spec.u_sum(xf, params)
        h_l = uf + halfsq(vf)
        h_b_fresh = spec.u_sum(xb, params) + halfsq(vb)
        h_b = jnp.where(valid > 0.5, h_back, h_b_fresh)

        def log_rate(h_to):
            raw = -0.5 * (h_to - h_cur)
            ok = jnp.abs(h_to) < 1e30  # finite guard (no isfinite on ints)
            ok = ok & (h_to == h_to)  # NaN guard
            return jnp.where(ok, jnp.minimum(raw, LOG_RATE_MAX), NEG_INF)

        log_gl = log_rate(h_l)
        log_glf = log_rate(h_b)
        gamma_l = jnp.exp(jnp.maximum(log_gl, NEG_INF))
        gamma_f = jnp.maximum(0.0, jnp.exp(log_glf) - gamma_l)
        total = gamma_l + gamma_f + beta
        dwell = 1.0 / total

        # categorical clock selection by inverse CDF — exactly equivalent to
        # the jnp path's Gumbel-max over log-rates, but one uniform and zero
        # transcendentals (rates are already clipped finite in linear space)
        s_shape = h_cur.shape
        u_sel = _uniform(s_shape) * total
        is_l = u_sel < gamma_l
        is_f = (~is_l) & (u_sel < gamma_l + gamma_f)
        is_r = (~is_l) & (~is_f)

        # accumulate Rao-Blackwell weighted moments of the dwelled-at state
        w = w + dwell
        wx = wx + dwell[None] * x
        wx2 = wx2 + dwell[None] * x * x
        evals = evals + jnp.float32(m) + jnp.float32(m) * (1.0 - valid)

        x_pre = x
        v_fresh = _normal(x.shape)
        bl = is_l[None]
        bf = is_f[None]
        x = jnp.where(bl, xf, x)
        v = jnp.where(bl, vf, jnp.where(bf, -v, v_fresh))
        g = jnp.where(bl, gf, g)
        u = jnp.where(is_l, uf, u)
        h_back = jnp.where(is_l, h_cur, jnp.where(is_f, h_l, h_back))
        valid = jnp.where(is_r, 0.0, 1.0)
        return (x, v, g, u, h_back, valid, w, wx, wx2, evals), (x_pre, dwell)

    return step


def _make_step_mm(spec: MatmulEnergySpec, params, eps, beta, m):
    """Fused jump-iteration body for the 2-D (d, lanes) matmul layout.

    Same semantics as ``_make_step``; per-chain scalars are (1, lanes) so
    every op stays a 2-D tile (Mosaic-friendly), and the energy's basis
    contractions run on the MXU via the spec's dot_generals.
    """

    def leapfrog_pair(x, vf, gf, vb, gb):
        xf, xb = x, x
        for _ in range(m):
            vf_h = vf - (0.5 * eps) * gf
            xf = xf + eps * vf_h
            gf = spec.du(xf, *params)
            vf = vf_h - (0.5 * eps) * gf

            vb_h = vb - (0.5 * eps) * gb
            xb = xb + eps * vb_h
            gb = spec.du(xb, *params)
            vb = vb_h - (0.5 * eps) * gb
        return xf, vf, gf, xb, vb, gb

    def halfsq(v):  # (d, lanes) -> (1, lanes)
        return 0.5 * jnp.sum(v * v, axis=0, keepdims=True)

    def step(carry):
        x, v, g, u, h_back, valid, w, wx, wx2, evals = carry
        h_cur = u + halfsq(v)

        xf, vf, gf, xb, vb, gb = leapfrog_pair(x, v, g, -v, g)
        uf = spec.u_sum(xf, *params)
        h_l = uf + halfsq(vf)
        h_b_fresh = spec.u_sum(xb, *params) + halfsq(vb)
        h_b = jnp.where(valid > 0.5, h_back, h_b_fresh)

        def log_rate(h_to):
            raw = -0.5 * (h_to - h_cur)
            ok = jnp.abs(h_to) < 1e30
            ok = ok & (h_to == h_to)
            return jnp.where(ok, jnp.minimum(raw, LOG_RATE_MAX), NEG_INF)

        log_gl = log_rate(h_l)
        log_glf = log_rate(h_b)
        gamma_l = jnp.exp(jnp.maximum(log_gl, NEG_INF))
        gamma_f = jnp.maximum(0.0, jnp.exp(log_glf) - gamma_l)
        total = gamma_l + gamma_f + beta
        dwell = 1.0 / total

        u_sel = _uniform(h_cur.shape) * total
        is_l = u_sel < gamma_l
        is_f = (~is_l) & (u_sel < gamma_l + gamma_f)
        is_r = (~is_l) & (~is_f)

        w = w + dwell
        wx = wx + dwell * x  # (1, lanes) broadcasts over d
        wx2 = wx2 + dwell * x * x
        evals = evals + jnp.float32(m) + jnp.float32(m) * (1.0 - valid)

        x_pre = x
        v_fresh = _normal(x.shape)
        x = jnp.where(is_l, xf, x)
        v = jnp.where(is_l, vf, jnp.where(is_f, -v, v_fresh))
        g = jnp.where(is_l, gf, g)
        u = jnp.where(is_l, uf, u)
        h_back = jnp.where(is_l, h_cur, jnp.where(is_f, h_l, h_back))
        valid = jnp.where(is_r, 0.0, 1.0)
        return (x, v, g, u, h_back, valid, w, wx, wx2, evals), (x_pre, dwell)

    return step


def _mjhmc_mm_kernel(
    spec: MatmulEnergySpec,
    n_params: int,
    num_steps: int,
    num_leapfrog: int,
    unroll: int,
    *refs,
):
    """Matmul-energy variant of ``_mjhmc_kernel`` (2-D layout)."""
    seed_ref, eps_ref, beta_ref = refs[:3]
    params = tuple(r[:] for r in refs[3 : 3 + n_params])
    (x_ref, v_ref, g_ref, u_ref, hback_ref, valid_ref) = refs[
        3 + n_params : 9 + n_params
    ]
    outs = refs[9 + n_params :]

    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    step = _make_step_mm(spec, params, eps_ref[0], beta_ref[0], num_leapfrog)

    assert num_steps % unroll == 0

    def body(_, c):
        for _i in range(unroll):
            c = step(c)[0]
        return c

    carry = jax.lax.fori_loop(
        0,
        num_steps // unroll,
        body,
        _read_carry(x_ref, v_ref, g_ref, u_ref, hback_ref, valid_ref),
    )
    _write_outs(carry, *outs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "spec", "num_steps", "num_leapfrog", "lane_block", "interpret", "unroll"
    ),
)
def pallas_mjhmc_mm_run(
    spec: MatmulEnergySpec,
    x: Array,  # (d, n)
    v: Array,
    g: Array,
    u: Array,  # (1, n)
    h_back: Array,
    back_valid: Array,  # (1, n) float 0/1
    seed: Array,
    epsilon: Array,
    beta: Array,
    num_steps: int,
    num_leapfrog: int,
    lane_block: int = 1024,
    interpret: bool = False,
    unroll: int = 1,
) -> PallasRunOut:
    """Fused engine run for matmul energies (product-of-t, sparse coding).

    Chain state (x, v, g + trajectory endpoints) lives in VMEM for the
    whole run; Φ/W and the patch are one-time VMEM inputs; Wᵀx / Φa
    contractions hit the MXU at f32 (HIGHEST) precision.
    """
    d, l = x.shape
    assert l % _LANES == 0
    k = spec.aux_rows()
    # live set per lane, calibrated against Mosaic's scoped-vmem report for
    # (d=128, k=64): ~32 d-row buffers (carry + trajectory temporaries +
    # double-buffered IO blocks for the 8 d-row ins/outs) + ~10 k-row matmul
    # temporaries + scalars
    bytes_per_lane = (32 * d + 10 * k + 32) * 4
    lb_budget = max(_LANES, (14 * 1024 * 1024 // bytes_per_lane) // _LANES * _LANES)
    lb = min(lane_block, lb_budget, l)
    lb = max(_LANES, lb // _LANES * _LANES)
    while l % lb:
        lb -= _LANES
    grid = (l // lb,)

    def dspec():
        return pl.BlockSpec((d, lb), lambda i: (0, i), memory_space=pltpu.VMEM)

    def sspec():
        return pl.BlockSpec((1, lb), lambda i: (0, i), memory_space=pltpu.VMEM)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    params = [jnp.asarray(p) for p in spec.param_arrays()]
    pspecs = [
        pl.BlockSpec(
            p.shape, (lambda i, nd=p.ndim: (0,) * nd), memory_space=pltpu.VMEM
        )
        for p in params
    ]

    if num_steps % unroll:
        unroll = 1
    kernel = functools.partial(
        _mjhmc_mm_kernel, spec, len(params), num_steps, num_leapfrog, unroll
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem, smem, smem]
        + pspecs
        + [dspec(), dspec(), dspec(), sspec(), sspec(), sspec()],
        out_specs=(
            dspec(), dspec(), dspec(), sspec(), sspec(), sspec(),
            sspec(), dspec(), dspec(), sspec(),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((d, l), jnp.float32),
            jax.ShapeDtypeStruct((d, l), jnp.float32),
            jax.ShapeDtypeStruct((d, l), jnp.float32),
            jax.ShapeDtypeStruct((1, l), jnp.float32),
            jax.ShapeDtypeStruct((1, l), jnp.float32),
            jax.ShapeDtypeStruct((1, l), jnp.float32),
            jax.ShapeDtypeStruct((1, l), jnp.float32),
            jax.ShapeDtypeStruct((d, l), jnp.float32),
            jax.ShapeDtypeStruct((d, l), jnp.float32),
            jax.ShapeDtypeStruct((1, l), jnp.float32),
        ),
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        jnp.asarray(epsilon, jnp.float32).reshape(1),
        jnp.asarray(beta, jnp.float32).reshape(1),
        *params, x, v, g, u, h_back, back_valid,
    )
    return PallasRunOut(*out)


def _read_carry(x_ref, v_ref, g_ref, u_ref, hback_ref, valid_ref):
    u = u_ref[:]
    return (
        x_ref[:], v_ref[:], g_ref[:], u, hback_ref[:], valid_ref[:],
        jnp.zeros_like(u), jnp.zeros_like(x_ref[:]), jnp.zeros_like(x_ref[:]),
        jnp.zeros_like(u),
    )


def _write_outs(carry, xo_ref, vo_ref, go_ref, uo_ref, hbacko_ref,
                valido_ref, w_ref, wx_ref, wx2_ref, evals_ref):
    (x, v, g, u, h_back, valid, w, wx, wx2, evals) = carry
    xo_ref[:] = x
    vo_ref[:] = v
    go_ref[:] = g
    uo_ref[:] = u
    hbacko_ref[:] = h_back
    valido_ref[:] = valid
    w_ref[:] = w
    wx_ref[:] = wx
    wx2_ref[:] = wx2
    evals_ref[:] = evals


def _mjhmc_kernel(
    spec: EnergySpec,
    num_steps: int,
    num_leapfrog: int,
    unroll: int,
    # refs:
    seed_ref,
    eps_ref,
    beta_ref,
    params_ref,
    x_ref,
    v_ref,
    g_ref,
    u_ref,
    hback_ref,
    valid_ref,
    # outs:
    xo_ref,
    vo_ref,
    go_ref,
    uo_ref,
    hbacko_ref,
    valido_ref,
    w_ref,
    wx_ref,
    wx2_ref,
    evals_ref,
):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    step = _make_step(spec, params_ref[:], eps_ref[0], beta_ref[0], num_leapfrog)

    # Mosaic fori_loop only supports unroll ∈ {1, full}; unroll manually by
    # fusing `unroll` iterations into one loop body
    assert num_steps % unroll == 0

    def body(_, c):
        for _i in range(unroll):
            c = step(c)[0]
        return c

    carry = jax.lax.fori_loop(
        0,
        num_steps // unroll,
        body,
        _read_carry(x_ref, v_ref, g_ref, u_ref, hback_ref, valid_ref),
    )
    _write_outs(carry, xo_ref, vo_ref, go_ref, uo_ref, hbacko_ref,
                valido_ref, w_ref, wx_ref, wx2_ref, evals_ref)


def _mjhmc_stream_kernel(
    spec: EnergySpec,
    num_emits: int,
    thin: int,
    num_leapfrog: int,
    # in refs:
    seed_ref,
    eps_ref,
    beta_ref,
    params_ref,
    x_ref,
    v_ref,
    g_ref,
    u_ref,
    hback_ref,
    valid_ref,
    # outs (first two live in HBM, written by explicit DMA):
    xs_ref,  # (num_emits, d, S, L) ANY/HBM
    ws_ref,  # (num_emits, S, L) ANY/HBM
    xo_ref,
    vo_ref,
    go_ref,
    uo_ref,
    hbacko_ref,
    valido_ref,
    w_ref,
    wx_ref,
    wx2_ref,
    evals_ref,
    # scratch:
    xscr_ref,  # (2, d, S, Lb) VMEM
    wscr_ref,  # (2, S, Lb) VMEM
    sem_x,  # DMA (2,)
    sem_w,  # DMA (2,)
):
    """Streaming variant: every ``thin``-th iteration's Rao-Blackwell
    emission (pre-transition x, dwell) is double-buffered through VMEM
    scratch and DMA'd to HBM while the sampler keeps running — the fused
    engine's equivalent of ``collect="samples"``.
    """
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    step = _make_step(spec, params_ref[:], eps_ref[0], beta_ref[0], num_leapfrog)
    i = pl.program_id(0)
    lb = xscr_ref.shape[-1]
    lane0 = pl.multiple_of(i * lb, 128)

    def dma_pair(slot, t):
        dx = pltpu.make_async_copy(
            xscr_ref.at[slot],
            xs_ref.at[t, :, :, pl.ds(lane0, lb)],
            sem_x.at[slot],
        )
        dw = pltpu.make_async_copy(
            wscr_ref.at[slot],
            ws_ref.at[t, :, pl.ds(lane0, lb)],
            sem_w.at[slot],
        )
        return dx, dw

    def emit_body(t, carry):
        # thin-1 dropped iterations, then one emitted iteration
        carry = jax.lax.fori_loop(0, thin - 1, lambda _, c: step(c)[0], carry)
        carry, (x_pre, dwell) = step(carry)

        slot = jax.lax.rem(t, 2)

        # reclaim the slot used two emissions ago
        @pl.when(t >= 2)
        def _():
            dx, dw = dma_pair(slot, t - 2)
            dx.wait()
            dw.wait()

        xscr_ref[slot] = x_pre
        wscr_ref[slot] = dwell
        dx, dw = dma_pair(slot, t)
        dx.start()
        dw.start()
        return carry

    carry = jax.lax.fori_loop(
        0,
        num_emits,
        emit_body,
        _read_carry(x_ref, v_ref, g_ref, u_ref, hback_ref, valid_ref),
    )

    # drain outstanding DMAs (last two emissions)
    for back in (2, 1):

        @pl.when(num_emits >= back)
        def _(back=back):
            t = num_emits - back
            dx, dw = dma_pair(jax.lax.rem(t, 2), t)
            dx.wait()
            dw.wait()

    _write_outs(carry, xo_ref, vo_ref, go_ref, uo_ref, hbacko_ref,
                valido_ref, w_ref, wx_ref, wx2_ref, evals_ref)


def _mjhmc_mm_stream_kernel(
    spec: MatmulEnergySpec,
    n_params: int,
    num_emits: int,
    thin: int,
    num_leapfrog: int,
    d_pad: int,
    *refs,
):
    """Streaming variant of ``_mjhmc_mm_kernel``: every ``thin``-th
    iteration's Rao-Blackwell emission (pre-transition x, dwell) is
    double-buffered through VMEM scratch and DMA'd to HBM while the
    sampler keeps running — same protocol as ``_mjhmc_stream_kernel``
    on the 2-D matmul layout.
    """
    seed_ref, eps_ref, beta_ref = refs[:3]
    params = tuple(r[:] for r in refs[3 : 3 + n_params])
    (x_ref, v_ref, g_ref, u_ref, hback_ref, valid_ref) = refs[
        3 + n_params : 9 + n_params
    ]
    xs_ref, ws_ref = refs[9 + n_params : 11 + n_params]  # HBM (ANY)
    outs = refs[11 + n_params : 21 + n_params]
    xscr_ref, wscr_ref, sem_x, sem_w = refs[21 + n_params :]

    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    step = _make_step_mm(spec, params, eps_ref[0], beta_ref[0], num_leapfrog)
    i = pl.program_id(0)
    lb = xscr_ref.shape[-1]
    lane0 = pl.multiple_of(i * lb, 128)

    def dma_pair(slot, t):
        dx = pltpu.make_async_copy(
            xscr_ref.at[slot],
            xs_ref.at[t, :, pl.ds(lane0, lb)],
            sem_x.at[slot],
        )
        dw = pltpu.make_async_copy(
            wscr_ref.at[slot],
            ws_ref.at[t, :, pl.ds(lane0, lb)],
            sem_w.at[slot],
        )
        return dx, dw

    def emit_body(t, carry):
        carry = jax.lax.fori_loop(0, thin - 1, lambda _, c: step(c)[0], carry)
        carry, (x_pre, dwell) = step(carry)

        # scratch/HBM stream rows are padded to a sublane multiple: Mosaic
        # cannot slice the slot axis of a (2, d, lb) buffer unless d is
        # 8-aligned, so emit d_pad rows and strip host-side
        d = x_pre.shape[0]
        if d_pad != d:
            x_pre = jnp.concatenate(
                [x_pre, jnp.zeros((d_pad - d,) + x_pre.shape[1:], x_pre.dtype)],
                axis=0,
            )

        slot = jax.lax.rem(t, 2)

        @pl.when(t >= 2)
        def _():
            dx, dw = dma_pair(slot, t - 2)
            dx.wait()
            dw.wait()

        xscr_ref[slot] = x_pre
        wscr_ref[slot] = dwell
        dx, dw = dma_pair(slot, t)
        dx.start()
        dw.start()
        return carry

    carry = jax.lax.fori_loop(
        0,
        num_emits,
        emit_body,
        _read_carry(x_ref, v_ref, g_ref, u_ref, hback_ref, valid_ref),
    )

    for back in (2, 1):

        @pl.when(num_emits >= back)
        def _(back=back):
            t = num_emits - back
            dx, dw = dma_pair(jax.lax.rem(t, 2), t)
            dx.wait()
            dw.wait()

    _write_outs(carry, *outs)


@functools.partial(
    jax.jit,
    static_argnames=("spec", "num_emits", "thin", "num_leapfrog", "lane_block"),
)
def pallas_mjhmc_mm_stream_run(
    spec: MatmulEnergySpec,
    x: Array,  # (d, n)
    v: Array,
    g: Array,
    u: Array,  # (1, n)
    h_back: Array,
    back_valid: Array,
    seed: Array,
    epsilon: Array,
    beta: Array,
    num_emits: int,
    thin: int,
    num_leapfrog: int,
    lane_block: int = 1024,
):
    """Streaming matmul-engine run: ``num_emits`` thinned Rao-Blackwell
    emissions, (xs (num_emits, d, n), ws (num_emits, 1, n), PallasRunOut).
    """
    d, l = x.shape
    d_pad = -(-d // _SUBLANES) * _SUBLANES  # streamed rows, sublane-aligned
    assert l % _LANES == 0
    k = spec.aux_rows()
    bytes_per_lane = (36 * d + 10 * k + 40) * 4  # + streaming scratch
    lb_budget = max(_LANES, (14 * 1024 * 1024 // bytes_per_lane) // _LANES * _LANES)
    lb = min(lane_block, lb_budget, l)
    lb = max(_LANES, lb // _LANES * _LANES)
    while l % lb:
        lb -= _LANES
    grid = (l // lb,)

    def dspec():
        return pl.BlockSpec((d, lb), lambda i: (0, i), memory_space=pltpu.VMEM)

    def sspec():
        return pl.BlockSpec((1, lb), lambda i: (0, i), memory_space=pltpu.VMEM)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    anyspec = pl.BlockSpec(memory_space=pltpu.ANY)

    params = [jnp.asarray(p) for p in spec.param_arrays()]
    pspecs = [
        pl.BlockSpec(
            p.shape, (lambda i, nd=p.ndim: (0,) * nd), memory_space=pltpu.VMEM
        )
        for p in params
    ]

    kernel = functools.partial(
        _mjhmc_mm_stream_kernel, spec, len(params), num_emits, thin,
        num_leapfrog, d_pad,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem, smem, smem]
        + pspecs
        + [dspec(), dspec(), dspec(), sspec(), sspec(), sspec()],
        out_specs=(
            anyspec, anyspec,
            dspec(), dspec(), dspec(), sspec(), sspec(), sspec(),
            sspec(), dspec(), dspec(), sspec(),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_emits, d_pad, l), jnp.float32),
            jax.ShapeDtypeStruct((num_emits, 1, l), jnp.float32),
            jax.ShapeDtypeStruct((d, l), jnp.float32),
            jax.ShapeDtypeStruct((d, l), jnp.float32),
            jax.ShapeDtypeStruct((d, l), jnp.float32),
            jax.ShapeDtypeStruct((1, l), jnp.float32),
            jax.ShapeDtypeStruct((1, l), jnp.float32),
            jax.ShapeDtypeStruct((1, l), jnp.float32),
            jax.ShapeDtypeStruct((1, l), jnp.float32),
            jax.ShapeDtypeStruct((d, l), jnp.float32),
            jax.ShapeDtypeStruct((d, l), jnp.float32),
            jax.ShapeDtypeStruct((1, l), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, d_pad, lb), jnp.float32),
            pltpu.VMEM((2, 1, lb), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        jnp.asarray(epsilon, jnp.float32).reshape(1),
        jnp.asarray(beta, jnp.float32).reshape(1),
        *params, x, v, g, u, h_back, back_valid,
    )
    xs, ws = out[0][:, :d, :], out[1]  # strip sublane padding rows
    return xs, ws, PallasRunOut(*out[2:])


class PallasRunOut(NamedTuple):
    x: Array
    v: Array
    grad: Array
    u: Array
    h_back: Array
    back_valid: Array
    w: Array  # (S, L) Σ dwell per chain
    wx: Array  # (d, S, L)
    wx2: Array  # (d, S, L)
    evals: Array  # (S, L) algorithmic grad evals (float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "spec", "num_steps", "num_leapfrog", "lane_block", "interpret", "unroll"
    ),
)
def pallas_mjhmc_run(
    spec: EnergySpec,
    x: Array,  # (d, 8, L)
    v: Array,
    g: Array,
    u: Array,  # (8, L)
    h_back: Array,
    back_valid: Array,  # (8, L) float 0/1
    seed: Array,  # () int32
    epsilon: Array,  # () f32
    beta: Array,  # () f32
    num_steps: int,
    num_leapfrog: int,
    lane_block: int = 2048,
    interpret: bool = False,
    unroll: int = 1,
) -> PallasRunOut:
    d, s, l = x.shape
    assert s == _SUBLANES and l % _LANES == 0
    # VMEM-aware lane blocking: the kernel's live set is ~14 d-sized + ~10
    # scalar-per-chain buffers per lane; cap the block so it fits a ~10MB
    # budget (16MB VMEM minus headroom) — matters for large-d energies
    # (e.g. the 50-D Gaussian), where a 2048-lane block overflows VMEM.
    bytes_per_lane = (14 * d + 10) * s * 4
    lb_budget = max(_LANES, (10 * 1024 * 1024 // bytes_per_lane) // _LANES * _LANES)
    lb = min(lane_block, lb_budget, l)
    lb = max(_LANES, lb // _LANES * _LANES)
    while l % lb:  # largest multiple of 128 ≤ budget that divides l
        lb -= _LANES
    grid = (l // lb,)

    def dspec():
        return pl.BlockSpec((d, s, lb), lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    def sspec():
        return pl.BlockSpec((s, lb), lambda i: (0, i), memory_space=pltpu.VMEM)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    # per-dim parameter vector broadcast to the state layout (kernel input —
    # Pallas forbids captured array constants); one-time DMA per run
    params = jnp.broadcast_to(
        jnp.asarray(spec.param_vector(d))[:, None, None], (d, s, l)
    )

    if num_steps % unroll:
        unroll = 1
    kernel = functools.partial(_mjhmc_kernel, spec, num_steps, num_leapfrog, unroll)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem, smem, smem]
        + [dspec(), dspec(), dspec(), dspec(), sspec(), sspec(), sspec()],
        out_specs=(
            dspec(), dspec(), dspec(), sspec(), sspec(), sspec(),
            sspec(), dspec(), dspec(), sspec(),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((d, s, l), jnp.float32),
            jax.ShapeDtypeStruct((d, s, l), jnp.float32),
            jax.ShapeDtypeStruct((d, s, l), jnp.float32),
            jax.ShapeDtypeStruct((s, l), jnp.float32),
            jax.ShapeDtypeStruct((s, l), jnp.float32),
            jax.ShapeDtypeStruct((s, l), jnp.float32),
            jax.ShapeDtypeStruct((s, l), jnp.float32),
            jax.ShapeDtypeStruct((d, s, l), jnp.float32),
            jax.ShapeDtypeStruct((d, s, l), jnp.float32),
            jax.ShapeDtypeStruct((s, l), jnp.float32),
        ),
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        jnp.asarray(epsilon, jnp.float32).reshape(1),
        jnp.asarray(beta, jnp.float32).reshape(1),
        params, x, v, g, u, h_back, back_valid,
    )
    return PallasRunOut(*out)


@functools.partial(
    jax.jit,
    static_argnames=("spec", "num_emits", "thin", "num_leapfrog", "lane_block"),
)
def pallas_mjhmc_stream_run(
    spec: EnergySpec,
    x: Array,
    v: Array,
    g: Array,
    u: Array,
    h_back: Array,
    back_valid: Array,
    seed: Array,
    epsilon: Array,
    beta: Array,
    num_emits: int,
    thin: int,
    num_leapfrog: int,
    lane_block: int = 2048,
):
    """Streaming engine run: ``num_emits`` thinned Rao-Blackwell emissions.

    Returns (xs, ws, PallasRunOut): xs (num_emits, d, 8, L) pre-transition
    positions, ws (num_emits, 8, L) dwell weights — produced by in-kernel
    double-buffered DMA to HBM at full engine speed.
    """
    d, s, l = x.shape
    assert s == _SUBLANES and l % _LANES == 0
    bytes_per_lane = (16 * d + 12) * s * 4  # + streaming scratch
    lb_budget = max(_LANES, (10 * 1024 * 1024 // bytes_per_lane) // _LANES * _LANES)
    lb = min(lane_block, lb_budget, l)
    lb = max(_LANES, lb // _LANES * _LANES)
    while l % lb:
        lb -= _LANES
    grid = (l // lb,)

    def dspec():
        return pl.BlockSpec((d, s, lb), lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    def sspec():
        return pl.BlockSpec((s, lb), lambda i: (0, i), memory_space=pltpu.VMEM)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    anyspec = pl.BlockSpec(memory_space=pltpu.ANY)

    params = jnp.broadcast_to(
        jnp.asarray(spec.param_vector(d))[:, None, None], (d, s, l)
    )
    kernel = functools.partial(
        _mjhmc_stream_kernel, spec, num_emits, thin, num_leapfrog
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem, smem, smem]
        + [dspec(), dspec(), dspec(), dspec(), sspec(), sspec(), sspec()],
        out_specs=(
            anyspec, anyspec,
            dspec(), dspec(), dspec(), sspec(), sspec(), sspec(),
            sspec(), dspec(), dspec(), sspec(),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_emits, d, s, l), jnp.float32),
            jax.ShapeDtypeStruct((num_emits, s, l), jnp.float32),
            jax.ShapeDtypeStruct((d, s, l), jnp.float32),
            jax.ShapeDtypeStruct((d, s, l), jnp.float32),
            jax.ShapeDtypeStruct((d, s, l), jnp.float32),
            jax.ShapeDtypeStruct((s, l), jnp.float32),
            jax.ShapeDtypeStruct((s, l), jnp.float32),
            jax.ShapeDtypeStruct((s, l), jnp.float32),
            jax.ShapeDtypeStruct((s, l), jnp.float32),
            jax.ShapeDtypeStruct((d, s, l), jnp.float32),
            jax.ShapeDtypeStruct((d, s, l), jnp.float32),
            jax.ShapeDtypeStruct((s, l), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, d, s, lb), jnp.float32),
            pltpu.VMEM((2, s, lb), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        jnp.asarray(epsilon, jnp.float32).reshape(1),
        jnp.asarray(beta, jnp.float32).reshape(1),
        params, x, v, g, u, h_back, back_valid,
    )
    xs, ws = out[0], out[1]
    return xs, ws, PallasRunOut(*out[2:])


def sharded_pallas_mjhmc_run(mesh, *run_args, **run_kwargs):
    """Run the fused kernel on every device of a ('chains',)-meshed batch.

    Chains are independent, so this is pure SPMD: each device runs the
    kernel on its lane shard with a device-offset PRNG seed; zero
    cross-device communication (shard_map with no collectives). Arrays use
    the engine layout — (d, 8, L) elementwise / (d, n) matmul, last axis
    sharded; the right kernel is picked from the spec.
    """
    from jax.sharding import PartitionSpec as P

    spec = run_args[0]
    x, v, g, u, h_back, back_valid, seed, eps, beta = run_args[1:10]
    rest = run_args[10:]
    run_fn = (
        pallas_mjhmc_mm_run
        if isinstance(spec, MatmulEnergySpec)
        else pallas_mjhmc_run
    )

    def local(x, v, g, u, h_back, back_valid):
        dev = jax.lax.axis_index("chains")
        dseed = jnp.int32(seed) + dev.astype(jnp.int32) * jnp.int32(131071)
        return tuple(
            run_fn(
                spec, x, v, g, u, h_back, back_valid, dseed, eps, beta,
                *rest, **run_kwargs,
            )
        )

    dvec = P(*([None] * (x.ndim - 1) + ["chains"]))  # state arrays
    dsca = P(*([None] * (u.ndim - 1) + ["chains"]))  # per-chain scalars
    out = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(dvec, dvec, dvec, dsca, dsca, dsca),
        out_specs=(dvec, dvec, dvec, dsca, dsca, dsca, dsca, dvec, dvec, dsca),
        check_vma=False,  # pallas out_shape carries no vma annotation
    )(x, v, g, u, h_back, back_valid)
    return PallasRunOut(*out)


# --------------------------------------------------------------------------
# engine wrapper
# --------------------------------------------------------------------------
@dataclasses.dataclass
class PallasMJHMC:
    """Drop-in high-throughput MJHMC engine for fused-energy distributions.

    ``nbatch`` is rounded up to a multiple of 1024 (extra independent
    chains). Statistical results (dwell-weighted moments) are validated
    against the XLA reference path in tests.
    """

    distribution: object
    epsilon: float = 1.0
    beta: float = 0.1
    num_leapfrog_steps: int = 10
    nbatch: int = 10_240
    seed: int = 0

    def __post_init__(self):
        self.spec = energy_spec_for(self.distribution)
        self._matmul = isinstance(self.spec, MatmulEnergySpec)
        n = ((self.nbatch + 1023) // 1024) * 1024
        self.nbatch = n
        d = self.distribution.ndims
        key = jax.random.key(self.seed)
        kx, kv = jax.random.split(key)
        x = self.distribution.init_x(kx, n)
        v = jax.random.normal(kv, x.shape, jnp.float32)
        u, g = self.distribution.potential_and_grad(x)
        if self._matmul:
            s, l = 1, n  # 2-D (d, n) layout; scalars (1, n)
        else:
            s, l = _SUBLANES, n // _SUBLANES
        self.x = x.reshape(d, s, l) if not self._matmul else x
        self.v = v.reshape(d, s, l) if not self._matmul else v
        self.g = g.reshape(d, s, l) if not self._matmul else g
        self.u = u.reshape(s, l)
        self.h_back = jnp.zeros((s, l), jnp.float32)
        self.back_valid = jnp.zeros((s, l), jnp.float32)
        # kernel seeds derive from the session's threefry key (the same RNG
        # discipline as the jnp path) — one fold_in per engine run
        self._seed_key = jax.random.key(self.seed)
        self._run_index = 0
        self._step_seed = self._next_seed()
        self.evals_total = jnp.float32(0.0)  # algorithmic grad evals, all runs
        self.steps_total = 0

    def _next_seed(self) -> np.int32:
        k = jax.random.fold_in(self._seed_key, self._run_index)
        self._run_index += 1
        raw = np.asarray(jax.random.key_data(k)).ravel()[-1]
        return np.int32(int(raw) & 0x7FFFFFFF)

    def sample(self, num_emits: int, thin: int = 1):
        """Streaming run: returns (xs, dwell) shaped (num_emits, d, nbatch)
        / (num_emits, nbatch) — the fused-engine ``collect='samples'``."""
        stream_fn = (
            pallas_mjhmc_mm_stream_run if self._matmul else pallas_mjhmc_stream_run
        )
        xs, ws, out = stream_fn(
            self.spec,
            self.x, self.v, self.g, self.u, self.h_back, self.back_valid,
            jnp.int32(self._step_seed),
            jnp.float32(self.epsilon),
            jnp.float32(self.beta),
            num_emits,
            thin,
            self.num_leapfrog_steps,
        )
        self._advance_seed()
        (self.x, self.v, self.g, self.u, self.h_back, self.back_valid) = (
            out.x, out.v, out.grad, out.u, out.h_back, out.back_valid
        )
        self.evals_total = self.evals_total + jnp.sum(out.evals)
        self.steps_total += num_emits * thin
        d = xs.shape[1]
        return (
            xs.reshape(num_emits, d, self.nbatch),
            ws.reshape(num_emits, self.nbatch),
        )

    def _advance_seed(self):
        self._step_seed = self._next_seed()

    def run(self, num_steps: int) -> PallasRunOut:
        run_fn = pallas_mjhmc_mm_run if self._matmul else pallas_mjhmc_run
        out = run_fn(
            self.spec,
            self.x, self.v, self.g, self.u, self.h_back, self.back_valid,
            jnp.int32(self._step_seed),
            jnp.float32(self.epsilon),
            jnp.float32(self.beta),
            num_steps,
            self.num_leapfrog_steps,
        )
        self._advance_seed()
        (self.x, self.v, self.g, self.u, self.h_back, self.back_valid) = (
            out.x, out.v, out.grad, out.u, out.h_back, out.back_valid
        )
        self.evals_total = self.evals_total + jnp.sum(out.evals)
        self.steps_total += num_steps
        return out

    @property
    def grad_evals(self) -> int:
        """Cumulative algorithmic gradient evaluations (all runs)."""
        return int(self.evals_total)

    @staticmethod
    def moments(out: PallasRunOut):
        """Dwell-weighted (mean, var) per dim from a run's accumulators."""
        w = jnp.sum(out.w)
        red = tuple(range(1, out.wx.ndim))  # (1,2) for 3-D, (1,) for 2-D
        mean = jnp.sum(out.wx, axis=red) / w
        var = jnp.sum(out.wx2, axis=red) / w - mean * mean
        return mean, var
