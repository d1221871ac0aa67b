"""Pallas TPU kernel: fused Cauchy-matrix generation + matmul.

The mixed-precision downsweep computes  Y = M @ X  where
``M[j, i] = zhat_j / ((poles_j - poles_shift_i) - tau_i) * ncolinv_i``
is never stored (rematerialized U).  The XLA path generates M in emulated f64,
writes it to HBM in f32, and then reads it back for the dot.  This kernel fuses
generation into the matmul: M tiles are built *in VMEM* with double-f32 pair
arithmetic (the pole differences cancel to ~1e-14 and need the two-sum
corrections; the final ratio only needs f32 relative accuracy since the matmul
runs in f32 anyway) and fed straight to the MXU.

Mosaic has no f64, so the driver pre-splits each f64 vector v into
(f32(v), f32(v - f64(f32(v)))) hi/lo pairs.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# f32 dot tiers on the MXU: "highest" ~ 6 bf16 passes (~2^-24 products);
# "bf16_3x" splits each f32 operand into bf16 hi+lo words and runs THREE
# DEFAULT-precision MXU passes (hi*hi + hi*lo + lo*hi), capturing ~16 of the
# 24 mantissa bits — ~1.5e-5-grade products at 2x the throughput.  (Mosaic
# rejects lax.Precision.HIGH inside kernels, hence the manual split.)  The
# downsweep's contamination is cleaned by the f64 refinement epilogue: one
# inverse-iteration pass leaves mixing ~ eta*lam_err/gap ~ 1e-5*4e-13/gap,
# which the existing risky-band CholeskyQR already covers.  bf16_3x is the
# DEFAULT: measured 2026-08-19 on the v5e (BENCH_HEADLINE n=16384 random
# 2.18 -> 1.92 s; Poisson 2.88 s) with residuals bit-identical
# (4.604e-14*||T||) and ortho 7.2e-12 / 7.6e-11 — both under target.
# SE_DOWNSWEEP_PRECISION=highest opts back.
_PRECISIONS = ("highest", "bf16_3x")
_DEFAULT_PRECISION = "bf16_3x"


def split_f64(v):
    """f64 (or f32) vector -> (hi, lo) f32 pair with hi + lo == v to ~2^-48."""
    hi = v.astype(jnp.float32)
    lo = (v - hi.astype(v.dtype)).astype(jnp.float32)
    return hi, lo


def _two_sum(a, b):
    """Knuth two-sum: s + err == a + b exactly (f32)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _kernel(kact, ph, plo, svh, svl, th, tl, z, ninv, x, out, *, prec, ti):
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    # DEFLATION SKIP: contraction slots are ordered survivors-first (slot <
    # rep.K active, the rest identity-passthrough with ncolinv == 0), so
    # i-blocks entirely past kact contribute exact zeros — skip their
    # generation and MXU passes.  Heavy-deflation spectra (Poisson: ~37
    # survivors per thousands-wide merge) skip almost the whole grid.
    @pl.when(i * ti < kact[0, 0])
    def _():
        pj_h = ph[0, :][:, None]      # (TJ, 1)
        pj_l = plo[0, :][:, None]
        sv_h = svh[0, :][None, :]     # (1, TI)
        sv_l = svl[0, :][None, :]
        tt_h = th[0, :][None, :]
        tt_l = tl[0, :][None, :]

        # den = (p_j - sv_i) - tau_i in double-f32
        s1, e1 = _two_sum(pj_h, -sv_h)
        e1 = e1 + (pj_l - sv_l)
        s2, e2 = _two_sum(s1, -tt_h)
        e2 = e2 + (e1 - tt_l)
        dh = s2 + e2
        dl = e2 - (dh - s2)

        zz = z[0, :][:, None]         # (TJ, 1)
        q = zz / dh
        q = q - q * (dl / dh)         # first-order correction of the pair divide
        m = q * ninv[0, :][None, :]

        # never DEFAULT alone: a single bf16 MXU pass (~4e-3 rel) would swamp
        # the refinement's contamination model
        dims = (((1,), (0,)), ((), ()))
        if prec == "bf16_3x":
            mh = m.astype(jnp.bfloat16)
            ml = (m - mh.astype(jnp.float32)).astype(jnp.bfloat16)
            xv = x[:]
            xh = xv.astype(jnp.bfloat16)
            xl = (xv - xh.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = jax.lax.dot_general(mh, xh, dims,
                                      preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(mh, xl, dims,
                                       preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(ml, xh, dims,
                                       preferred_element_type=jnp.float32)
            out[:] += acc
        else:
            out[:] += jax.lax.dot_general(
                m, x[:], dims,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)


def cauchy_matmul(poles, shift_val, tau, zhat, ncolinv, X,
                  tj: int = 256, ti: int = 512, tc: int = 512,
                  kact=None):
    """Y (m, C) f32 = M @ X with M generated on the fly.

    poles/shift_val/tau: f64 (m,); zhat/ncolinv: (m,) any float; X: (m, C) f32.
    Shapes must tile evenly (caller falls back to the XLA path otherwise).
    Small merges (m < ti) run with full-m tiles — the deep tree levels
    (m = 64..256) would otherwise fall back to the XLA emulated-f64
    generate-then-dot path, ~0.14 s per level at n=16384.

    ``kact``: traced count of ACTIVE contraction slots (the merge's
    surviving secular roots, rep.K).  Slots are ordered survivors-first and
    ncolinv is 0 past kact, so contraction blocks beyond it contribute
    exact zeros — the kernel skips them (same output bit-for-bit).  None =
    all m slots active.

    SE_DOWNSWEEP_PRECISION selects the MXU f32 dot tier (read OUTSIDE the
    jit so it keys the compile cache): "bf16_3x" (default) or "highest".
    """
    prec = os.environ.get("SE_DOWNSWEEP_PRECISION",
                          _DEFAULT_PRECISION).lower()
    if prec not in _PRECISIONS:
        prec = _DEFAULT_PRECISION
    if kact is None:
        kact = poles.shape[0]
    return _cauchy_matmul(poles, shift_val, tau, zhat, ncolinv, X,
                          jnp.asarray(kact), tj, ti, tc, prec)


@functools.partial(jax.jit,
                   static_argnames=("tj", "ti", "tc", "prec"))
def _cauchy_matmul(poles, shift_val, tau, zhat, ncolinv, X, kact,
                   tj: int = 256, ti: int = 512, tc: int = 512,
                   prec: str = "highest"):
    m = poles.shape[0]
    C = X.shape[1]
    if m < ti:
        tj = ti = m
    ph, plo = split_f64(poles)
    svh, svl = split_f64(shift_val)
    th, tl = split_f64(tau)
    z32 = zhat.astype(jnp.float32)
    n32 = ncolinv.astype(jnp.float32)
    X = X.astype(jnp.float32)
    k32 = jnp.asarray(kact, jnp.int32).reshape(1, 1)

    grid = (m // tj, C // tc, m // ti)
    # under jax_enable_x64 the index-map constants trace as i64, which Mosaic
    # cannot legalize ("func.return (i32, i64, i32)"); trace the kernel x32
    with jax.enable_x64(False):
        return _call(grid, k32, ph, plo, svh, svl, th, tl, z32, n32, X,
                     tj, ti, tc, m, C, prec)


def _call(grid, k32, ph, plo, svh, svl, th, tl, z32, n32, X, tj, ti, tc,
          m, C, prec="highest"):
    def vec_spec(tile, pick):
        return pl.BlockSpec((1, tile), pick, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, prec=prec, ti=ti),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda j, c, i: (0, 0),
                         memory_space=pltpu.SMEM),  # kact (scalar)
            vec_spec(tj, lambda j, c, i: (0, j)),   # poles hi
            vec_spec(tj, lambda j, c, i: (0, j)),   # poles lo
            vec_spec(ti, lambda j, c, i: (0, i)),   # shift hi
            vec_spec(ti, lambda j, c, i: (0, i)),   # shift lo
            vec_spec(ti, lambda j, c, i: (0, i)),   # tau hi
            vec_spec(ti, lambda j, c, i: (0, i)),   # tau lo
            vec_spec(tj, lambda j, c, i: (0, j)),   # zhat
            vec_spec(ti, lambda j, c, i: (0, i)),   # ncolinv
            pl.BlockSpec((ti, tc), lambda j, c, i: (i, c),
                         memory_space=pltpu.VMEM),  # X
        ],
        out_specs=pl.BlockSpec((tj, tc), lambda j, c, i: (j, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, C), jnp.float32),
    )(k32, ph[None, :], plo[None, :], svh[None, :], svl[None, :],
      th[None, :], tl[None, :], z32[None, :], n32[None, :], X)


def supported(m: int, C: int, tj=256, ti=512, tc=512) -> bool:
    if m < ti:                      # full-m tiles for small merges
        return m % 8 == 0 and C % tc == 0
    return m % tj == 0 and m % ti == 0 and C % tc == 0


def _mat_kernel(kact, ph, plo, svh, svl, th, tl, z, ninv, slot, out, *, tj):
    """Materialize a U tile: Cauchy entries for active columns, e_slot
    passthrough for deflated ones (assemble_u's row_block, in VMEM pair-f32
    instead of XLA emulated f64 — the ROOT of the downsweep)."""
    j = pl.program_id(0)

    sv_h = svh[0, :][None, :]     # (1, TC) per-column shift/tau/norm/slot
    sv_l = svl[0, :][None, :]
    tt_h = th[0, :][None, :]
    tt_l = tl[0, :][None, :]
    sl = slot[0, :][None, :]

    pj_h = ph[0, :][:, None]      # (TJ, 1) per-row poles/zhat
    pj_l = plo[0, :][:, None]
    zz = z[0, :][:, None]

    s1, e1 = _two_sum(pj_h, -sv_h)
    e1 = e1 + (pj_l - sv_l)
    s2, e2 = _two_sum(s1, -tt_h)
    e2 = e2 + (e1 - tt_l)
    dh = s2 + e2
    dl = e2 - (dh - s2)

    q = zz / dh
    q = q - q * (dl / dh)
    u = q * ninv[0, :][None, :]

    rows = j * tj + jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
    act = sl < kact[0, 0]
    eye = (rows == sl).astype(u.dtype)
    out[:] = jnp.where(act, u, eye)


@functools.partial(jax.jit, static_argnames=("tj", "tc"))
def cauchy_materialize(poles, shift_val, tau, zhat, ncolinv, slots, kact,
                       tj: int = 256, tc: int = 512):
    """U[:, sel] (m, C) f32 materialized on the fly (no matmul).

    Per-COLUMN inputs are already gathered for the selected slots:
    shift_val/tau (C,) f64, ncolinv (C,) (0 for deflated slots), slots (C,)
    int; per-ROW inputs poles/zhat (m,).  kact = rep.K: columns with
    slot >= kact are identity passthrough e_slot.  Entry formula and pair
    arithmetic identical to the fused matmul kernel above; f32-grade output
    is the mixed-precision downsweep's contract (refinement absorbs it,
    exactly as for every non-root level).
    """
    m = poles.shape[0]
    C = slots.shape[0]
    tj = min(tj, m)
    ph, plo = split_f64(poles)
    svh, svl = split_f64(shift_val)
    th, tl = split_f64(tau)
    z32 = zhat.astype(jnp.float32)
    n32 = ncolinv.astype(jnp.float32)
    sl32 = jnp.asarray(slots, jnp.int32)
    k32 = jnp.asarray(kact, jnp.int32).reshape(1, 1)

    grid = (m // tj, C // tc)

    def vec_j(pick=lambda j, c: (0, j)):
        return pl.BlockSpec((1, tj), pick, memory_space=pltpu.VMEM)

    def vec_c(pick=lambda j, c: (0, c)):
        return pl.BlockSpec((1, tc), pick, memory_space=pltpu.VMEM)

    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_mat_kernel, tj=tj),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda j, c: (0, 0),
                             memory_space=pltpu.SMEM),   # kact
                vec_j(), vec_j(),                        # poles hi/lo
                vec_c(), vec_c(),                        # shift hi/lo
                vec_c(), vec_c(),                        # tau hi/lo
                vec_j(),                                 # zhat
                vec_c(),                                 # ncolinv
                vec_c(),                                 # slots
            ],
            out_specs=pl.BlockSpec((tj, tc), lambda j, c: (j, c),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, C), jnp.float32),
        )(k32, ph[None, :], plo[None, :], svh[None, :], svl[None, :],
          th[None, :], tl[None, :], z32[None, :], n32[None, :],
          sl32[None, :])


def materialize_supported(m: int, C: int, tj=256, tc=512) -> bool:
    return (m % min(tj, m) == 0 and m % 8 == 0 and C % tc == 0)