"""Pallas TPU kernel: f64-grade GEMM on the MXU via exact bf16 slicing.

TPU has no f64 unit: XLA's emulated-f64 ``dot`` runs at ~0.1 TFLOP/s here
(VPU pair arithmetic plus full-size temporaries).  This kernel reaches
MXU-class rates for f64-grade products with the Ozaki-style fixed-point
splitting:

  * every operand row (A) / column (B) is normalized by a power-of-two scale
    per 128-wide k-block and peeled into NSLICE=6 bf16 slices on fixed
    2^-8(t+1) grids — each slice holds <= 8 significand bits, covering the
    platform's 48-bit emulated-f64 mantissa (CLAUDE.md);
  * slice products are exact in f32 (8x8 -> 16 bits) and a 128-term MXU
    accumulation stays exact (<= 2^23 grid units < 2^24), so each of the 21
    pass matmuls (slice pairs with combined scale >= 2^-48) is *error-free*;
  * passes are folded into a double-f32 value with Knuth two-sums, scaled
    back by the exact power-of-two row/column scales, and accumulated across
    k-blocks through three compensation channels (s, c, cc).

Net effect: ~2^-47-grade GEMM at 21 bf16 passes per 128-k-block — effective
~4 TFLOP/s of f64 work, ~40x the XLA emulated path.  Used for the dense
front-end's blocked-Householder trailing updates and compact-WY eigenvector
backtransformation (kernels/tridiagonalize.py), i.e. the work the reference
delegates to MKL's dsyr2k/dgemm (Makefile:13).

Slicing uses only adds/subtracts on fixed grids (the (r + C) - C rounding
trick) — no rounded multiplies — so no compiler FMA contraction can change
any value (see dword_matvec.py for why that matters).

Range: per-element products must stay above ~1e-20 in magnitude, where the
f32 compensation channels start to denormalize — the same point at which the
platform's own emulated-f64 lo words do (f32 exponent range; CLAUDE.md).
The framework prescales all inputs to O(1), which keeps everything far from
that edge.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cauchy_matmul import split_f64, _two_sum

NSLICE = 6
KB = 128          # k-block width: 128-term f32 accumulation of 16-bit
                  # products stays exact (128 * (2^8-1)^2 < 2^24 grid units)
_TM = 256
_TN = 256


def _pow2_ceil(m):
    """Smallest power of two >= m (f32, elementwise); 1.0 where m == 0."""
    bits = jax.lax.bitcast_convert_type(m, jnp.int32)
    e = (bits >> 23) & 0xFF
    e = jnp.minimum(e + 1, 254)
    se = jax.lax.bitcast_convert_type((e << 23).astype(jnp.int32), jnp.float32)
    return jnp.where(m == 0, jnp.ones_like(se), se)


def _grid_round(r, t):
    """Round r (f32) to the slice-t grid (multiples of 2^-8(t+1)) exactly.

    Implemented as round(r * 2^8(t+1)) * 2^-8(t+1): both scalings are exact
    power-of-two multiplies and lax.round is an opaque op the compiler must
    keep.  The classic (r + C) - C magic-constant trick is NOT safe in
    XLA-level code on this platform: the terminal pins
    --xla_allow_excess_precision=true and XLA's algebraic simplifier folds
    the add/subtract pair away in some fusion positions (observed on v5e:
    slices 0 and 3 came out off-grid with ~0.5-grid-unit error, degrading
    the whole kernel from 2^-47-grade to ~1e-5-grade without any failure).
    """
    g = np.float32(2.0 ** (8 * (t + 1)))
    return jnp.round(r * g) * np.float32(1.0 / g)


def _peel_slices(rh, rl):
    """Peel NSLICE bf16 slices from a normalized (|.| <= 1) f32 pair.

    Slices 0-2 take rh's 24 bits exactly; the remainder joins rl (one ~2^-47
    rounding, at the platform's own f64 roundoff) for slices 3-5.
    """
    slices = []
    r = rh
    for t in range(3):
        p = _grid_round(r, t)
        slices.append(p.astype(jnp.bfloat16))
        r = r - p
    r = r + rl
    for t in range(3, NSLICE):
        p = _grid_round(r, t)
        slices.append(p.astype(jnp.bfloat16))
        r = r - p
    return jnp.stack(slices)


def slice_lhs(A, kb: int = KB):
    """A (M, K) f64 -> (slices (NSLICE, M, K) bf16, scales (K/kb, M) f32)."""
    M, K = A.shape
    ah, al = split_f64(A)
    m = jnp.max(jnp.abs(ah).reshape(M, K // kb, kb), axis=2)
    se = _pow2_ceil(m)                       # (M, K/kb)
    rinv = 1.0 / jnp.repeat(se, kb, axis=1)  # exact: powers of two
    # scales returned transposed (K/kb, M): the kernel picks its k-block row
    # with a sublane-dim dynamic index (lane-dim dynamic indexing needs
    # 128-multiples, which Mosaic cannot prove for program ids)
    return _peel_slices(ah * rinv, al * rinv), se.T


def slice_rhs(B, kb: int = KB):
    """B (K, N) f64 -> (slices (NSLICE, K, N) bf16, scales (K/kb, N) f32)."""
    K, N = B.shape
    bh, bl = split_f64(B)
    m = jnp.max(jnp.abs(bh).reshape(K // kb, kb, N), axis=1)
    se = _pow2_ceil(m)                       # (K/kb, N)
    rinv = 1.0 / jnp.repeat(se, kb, axis=0)
    return _peel_slices(bh * rinv, bl * rinv), se


def _kernel(asl, bsl, sa, sb, outh, outl, acc_s, acc_c, acc_cc):
    k = pl.program_id(2)
    n_k = pl.num_programs(2)
    # sa block is (n_k, tm), sb is (n_k, tn): the k-block's scales are picked
    # with a sublane-dim dynamic index, then broadcast
    sa_k = sa[k, :][:, None]          # (tm, 1)
    sb_k = sb[k, :][None, :]          # (1, tn)

    @pl.when(k == 0)
    def _():
        acc_s[:] = jnp.zeros_like(acc_s)
        acc_c[:] = jnp.zeros_like(acc_c)
        acc_cc[:] = jnp.zeros_like(acc_cc)

    # 21 exact pass matmuls, cascaded into a double-f32 (h, l).
    # Passes with combined slice order s = si + sj <= 3 go through two-sums;
    # the 2^-32-and-below tail (s >= 4) adds into the low word directly.
    h = jax.lax.dot_general(
        asl[0], bsl[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    l = jnp.zeros_like(h)
    for s in range(1, NSLICE):
        for si in range(0, s + 1):
            sj = s - si
            if si >= NSLICE or sj >= NSLICE:
                continue
            d = jax.lax.dot_general(
                asl[si], bsl[sj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if s <= 3:
                h, e = _two_sum(h, d)
                l = l + e
            else:
                l = l + d

    sc = sa_k * sb_k            # (TM,1)*(1,TN): exact powers of two
    h = h * sc
    l = l * sc

    s_, e1 = _two_sum(acc_s[:], h)
    c_, e2 = _two_sum(acc_c[:], l + e1)
    acc_s[:] = s_
    acc_c[:] = c_
    acc_cc[:] = acc_cc[:] + e2

    @pl.when(k == n_k - 1)
    def _():
        hi, lo = _two_sum(acc_s[:], acc_c[:] + acc_cc[:])
        outh[:] = hi
        outl[:] = lo


@functools.partial(jax.jit, static_argnames=("tm", "tn"))
def _dword_matmul_pair(asl, sa, bsl, sb, tm: int, tn: int):
    _, M, K = asl.shape
    _, _, N = bsl.shape
    n_kb = K // KB
    grid = (M // tm, N // tn, n_kb)

    with jax.enable_x64(False):  # i64 index-map constants break Mosaic
        outh, outl = pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((NSLICE, tm, KB), lambda i, j, k: (0, i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NSLICE, KB, tn), lambda i, j, k: (0, k, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_kb, tm), lambda i, j, k: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_kb, tn), lambda i, j, k: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((M, N), jnp.float32)] * 2,
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)] * 3,
        )(asl, bsl, sa, sb)
    return outh, outl


def dword_matmul(A, B, tm: int = _TM, tn: int = _TN):
    """Y (M, N) f64 = A @ B at ~2^-47 relative accuracy, MXU-rate.

    A (M, K), B (K, N) f64 (or f32).  Shapes are zero-padded to tiles
    internally; K is padded to a multiple of 128.

    PRECONDITION: entries must be finite with |x| < 2^126 — the per-row
    power-of-two normalization (``_pow2_ceil``) clamps its exponent at 254,
    so rows containing inf/NaN or magnitudes >= ~2^127 silently break the
    |normalized| <= 1 invariant the exact bf16 slicing relies on, degrading
    the 2^-47 accuracy claim without any error.  The driver guarantees this
    by prescaling every input to O(1) (see driver._solve); any new caller
    must do the same.
    """
    M, K = A.shape
    K2, N = B.shape
    assert K == K2, (A.shape, B.shape)
    dt = A.dtype
    # Mosaic lane-dim rule: every block's LAST dim must be a multiple of 128
    # (or equal the full padded array dim) — blocks that lower fine in
    # interpret mode are rejected on hardware ("block shape ... divisible by
    # 8 and 128").  tn is the lane dim of bsl/out blocks; tm is a sublane
    # dim there BUT the lane dim of the sa-scales block (n_kb, tm), so BOTH
    # must round up to 128-multiples (q8a failure: tm=32 with M=128 ->
    # sa block (32, 32) on array (32, 128) rejected).
    tn = 128 * ((max(tn, 1) + 127) // 128)
    tm = 128 * ((max(tm, 1) + 127) // 128)
    pm, pk, pn = (-M) % tm, (-K) % KB, (-N) % tn
    if pm or pk:
        A = jnp.pad(A, ((0, pm), (0, pk)))
    if pk or pn:
        B = jnp.pad(B, ((0, pk), (0, pn)))
    asl, sa = slice_lhs(A)
    bsl, sb = slice_rhs(B)
    outh, outl = _dword_matmul_pair(asl, sa, bsl, sb, tm, tn)
    Y = outh.astype(dt) + outl.astype(dt)
    return Y[:M, :N]


