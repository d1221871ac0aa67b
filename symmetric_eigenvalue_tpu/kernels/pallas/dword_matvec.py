"""Pallas TPU kernel: double-word (f64-grade) vector-matrix product.

The dense tridiagonalization front-end (kernels/tridiagonalize.py) needs one
full-width matvec ``w = A @ v`` per Householder column.  XLA's emulated-f64
matvec lowers to ~10 ms at n=4096 (materializing several full-size f32-pair
temporaries); the same product is bandwidth-bound at ~0.25 ms.  This kernel
streams A once as an (hi, lo) f32 pair and performs the dot in double-word
arithmetic on the VPU.

Exactness strategy: compilers (XLA:CPU fusion, and potentially Mosaic) may
contract ``a*b + c`` into an FMA, which silently breaks any compensated
scheme that relies on the *rounded* product ``fl(a*b)`` (the classic Dekker
two-product).  Instead, both operands are pre-split by **mantissa masking**
(zero the low 12 significand bits; the remainder is the exact tail), so all
partial products have <= 24-bit significands and are *exactly representable*
in f32 — no rounding happens in any multiply, with or without contraction.
The exact partial products are then folded with Knuth two-sums through three
compensation channels (s, c, cc), keeping ~2^-48 relative accuracy — the
same unit roundoff as the platform's emulated f64 (see CLAUDE.md) — at
~40 f32 VPU ops/element instead of XLA's temp-bound lowering.

A is symmetric in the caller, so y = v @ A == A @ v; the kernel contracts
over the *row* index so A tiles stream in their native layout.

Reference analog: the MKL ``dsymv``/``dsytrd`` column loop (the reference
itself has no dense front-end; this supports the repo's own ``driver.eigh``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cauchy_matmul import split_f64, _two_sum

# zero the low 12 stored-mantissa bits: keeps 12 significand bits (11 stored
# + hidden), so products of two masked values fit f32's 24-bit significand
import numpy as np

_HI_MASK = np.uint32(0xFFFFF000)


def _mask_split(a):
    """Split f32 a into (a1, a2) with a1 + a2 == a exactly; both halves have
    <= 12 significand bits, so any pairwise product is exact in f32."""
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    a1 = jax.lax.bitcast_convert_type(bits & _HI_MASK, jnp.float32)
    return a1, a - a1


def _kernel(vh, vl, ah, al, out, acc_s, acc_c, acc_cc):
    i = pl.program_id(1)
    n_i = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        acc_s[:] = jnp.zeros_like(acc_s)
        acc_c[:] = jnp.zeros_like(acc_c)
        acc_cc[:] = jnp.zeros_like(acc_cc)

    vh_t = vh[0, :][:, None]          # (TI, 1)
    vl_t = vl[0, :][:, None]
    v1, v2 = _mask_split(vh_t)

    ah_ = ah[:]                        # (TI, TJ)
    al_ = al[:]
    a1, a2 = _mask_split(ah_)

    # all four partial products are exact (12-bit x 12-bit significands)
    p11 = v1 * a1
    q, eq = _two_sum(v1 * a2, v2 * a1)
    h, eh = _two_sum(p11, q)
    # tail terms are O(2^-24) relative: plain adds keep them to ~2^-48
    tail = ((v2 * a2 + eq) + eh) + (vh_t * al_ + vl_t * ah_)

    s = acc_s[:]
    c = acc_c[:]
    cc = acc_cc[:]
    ti = h.shape[0]
    for k in range(ti // 8):
        hk = h[8 * k:8 * k + 8, :]
        tk = tail[8 * k:8 * k + 8, :]
        s, e1 = _two_sum(s, hk)
        c, e2 = _two_sum(c, tk + e1)
        cc = cc + e2
    acc_s[:] = s
    acc_c[:] = c
    acc_cc[:] = cc

    @pl.when(i == n_i - 1)
    def _():
        # fold the 8 sublane rows pairwise with two-sums, then emit (hi, lo)
        s = acc_s[:]
        c = acc_c[:] + acc_cc[:]
        for half in (4, 2, 1):
            s_new, err = _two_sum(s[:half, :], s[half:2 * half, :])
            c = c[:half, :] + c[half:2 * half, :] + err
            s = s_new
        hi, lo = _two_sum(s, c)  # renormalize
        out[0:1, :] = hi
        out[1:2, :] = lo


@functools.partial(jax.jit, static_argnames=("ti", "tj"))
def dword_vecmat_pair(vh, vl, ah, al, ti: int = 256, tj: int = 512):
    """(yh, yl) f32 pair = (vh + vl) @ (ah + al).

    vh/vl: (n,) f32; ah/al: (n, m) f32.  n % ti == 0 and m % tj == 0 required
    (see :func:`supported`).
    """
    n, m = ah.shape
    grid = (m // tj, n // ti)

    def vspec():
        return pl.BlockSpec((1, ti), lambda j, i: (0, i),
                            memory_space=pltpu.VMEM)

    def aspec():
        return pl.BlockSpec((ti, tj), lambda j, i: (i, j),
                            memory_space=pltpu.VMEM)

    with jax.enable_x64(False):  # i64 index-map constants break Mosaic
        out = pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[vspec(), vspec(), aspec(), aspec()],
            out_specs=pl.BlockSpec((2, tj), lambda j, i: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, m), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, tj), jnp.float32)] * 3,
        )(vh[None, :], vl[None, :], ah, al)
    return out[0], out[1]


def dword_vecmat(v, ah, al, ti: int = 256, tj: int = 512):
    """y (m,) f64 = v @ (ah + al) for f64 v and pre-split A."""
    vh, vl = split_f64(v)
    yh, yl = dword_vecmat_pair(vh, vl, ah, al, ti=ti, tj=tj)
    return yh.astype(v.dtype) + yl.astype(v.dtype)


def supported(n: int, m: int, ti: int = 256, tj: int = 512) -> bool:
    return n % ti == 0 and m % tj == 0
