"""Double-word (f32-pair) arithmetic primitives for Pallas TPU kernels.

TPU has no f64 ALU; the platform emulates f64 as f32 pairs (unit roundoff
~2^-48, CLAUDE.md).  Pallas/Mosaic kernels cannot even take f64 operands, so
any kernel that must be f64-GRADE works on explicit (hi, lo) f32 pairs.  This
module is the shared value-level toolkit: add/sub/mul/div/sqrt on pairs, each
accurate to ~2^-47 relative, built under two hard constraints measured on
this machine (CLAUDE.md "Hard-won TPU facts"):

* **FMA contraction**: XLA:CPU (provably) and possibly Mosaic contract
  ``a*b + c`` into fused multiply-adds, which changes the VALUE of any
  compensated scheme relying on the rounded product ``fl(a*b)`` (classic
  Dekker two-product).  Every multiply here is therefore made EXACT by
  construction: operands are pre-split by mantissa masking (12-bit halves,
  :func:`mask_split`), so partial products fit f32's 24-bit significand and
  no multiply ever rounds — contraction cannot change anything.
* **Excess-precision folding**: the terminal pins
  ``--xla_allow_excess_precision=true`` and the algebraic simplifier folds
  magic-constant rounding tricks ``(r + C) - C`` away fusion-dependently
  (observed on v5e).  Nothing here uses magic constants; Knuth two-sums
  (adds only) survive the simplifier.

These functions are plain jnp expressions — usable inside Pallas kernel
bodies, in interpret mode, and directly under jit (the unit tests run them
on CPU against numpy f64).

RANGE ENVELOPE (same as dword_matmul's documented precondition): full
~2^-47 accuracy requires every value AND every product to keep its pair's
low word inside f32's normal range — in practice |x| in ~[2^-35, 2^35] for
multiplicands.  Callers prescale their data to O(1); products of O(1)
values are always safe.

Reference analog: none (the reference runs real f64 via LAPACK/MKL,
``/root/reference/src/eigenvalues.c``); this exists purely so TPU-native
kernels can match LAPACK-grade accuracy on f32 hardware.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_HI_MASK = np.uint32(0xFFFFF000)  # zero low 12 stored-mantissa bits


def two_sum(a, b):
    """Knuth two-sum: s + err == a + b exactly (branch-free, f32)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def fast_two_sum(a, b):
    """Dekker two-sum, REQUIRES |a| >= |b| (or a == 0): s + err == a + b."""
    s = a + b
    err = b - (s - a)
    return s, err


def mask_split(a):
    """Split f32 a into (a1, a2), a1 + a2 == a exactly; each half has <= 12
    significand bits so any pairwise product of halves is exact in f32."""
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    a1 = jax.lax.bitcast_convert_type(bits & _HI_MASK, jnp.float32)
    return a1, a - a1


def renorm(h, l):
    """Renormalize a pair so |l| <= ulp(h)/2 (two_sum; no magnitude assumption)."""
    return two_sum(h, l)


def add(ah, al, bh, bl):
    """(ah+al) + (bh+bl) as a renormalized pair (~2^-48)."""
    s, e = two_sum(ah, bh)
    t = e + (al + bl)
    return two_sum(s, t)


def sub(ah, al, bh, bl):
    return add(ah, al, -bh, -bl)


def mul_f32(a, b):
    """EXACT product of two plain f32 values as a pair: h + l == a * b.

    Dekker two-product with mask splits: all four partial products are exact
    (12x12-bit significands), Dekker's theorem makes every add in the tail
    chain exact too.  FMA contraction cannot change anything: contracting
    e.g. ``a1*b1 - h`` into ``fma(a1, b1, -h)`` is value-identical because
    the product a1*b1 is exactly representable.  Costs ~10 VPU ops.
    """
    a1, a2 = mask_split(a)
    b1, b2 = mask_split(b)
    h = a * b
    l = (((a1 * b1 - h) + a1 * b2) + a2 * b1) + a2 * b2
    return h, l


def mul(ah, al, bh, bl):
    """(ah+al) * (bh+bl) as a pair, ~2^-47 relative."""
    h, l = mul_f32(ah, bh)
    # cross terms are O(2^-24) relative: plain adds keep them to ~2^-48;
    # al*bl is at exactly the 2^-48 target scale — include it, it's one op
    l = l + (ah * bl + al * bh + al * bl)
    return two_sum(h, l)


def div(ah, al, bh, bl):
    """(ah+al) / (bh+bl) as a pair, ~2^-46 relative.

    One Newton step on the f32 quotient: q0 = ah/bh has ~2^-24 relative
    error; the residual a - q0*b is computed in pair arithmetic (exact
    product q0*b), so q0 + (a - q0 b)/b_h lands at ~2^-47.  The divisor must
    be nonzero (callers clamp, as the refinement solvers do).
    """
    q0 = ah / bh
    ph, plo = mul_f32(q0, bh)
    plo = plo + q0 * bl
    rh, rl = sub(ah, al, ph, plo)
    q1 = (rh + rl) / bh
    return two_sum(q0, q1)


def sqrt(ah, al):
    """sqrt(ah+al) as a pair, ~2^-47 relative; exact 0 for 0 (and any
    non-positive hi word, the callers' convention for padded lanes)."""
    ok = ah > 0
    a_safe = jnp.where(ok, ah, jnp.ones_like(ah))
    s0 = jnp.sqrt(a_safe)
    ph, plo = mul_f32(s0, s0)
    rh, rl = sub(ah, al, ph, plo)
    corr = (rh + rl) / (2.0 * s0)
    h, l = two_sum(s0, corr)
    zero = jnp.zeros_like(ah)
    return jnp.where(ok, h, zero), jnp.where(ok, l, zero)


def from_f64(v):
    """f64 (or f32) array -> (hi, lo) f32 pair with hi + lo == v to ~2^-48."""
    hi = v.astype(jnp.float32)
    lo = (v - hi.astype(v.dtype)).astype(jnp.float32)
    return hi, lo


def to_f64(h, l):
    return h.astype(jnp.float64) + l.astype(jnp.float64)


def sum_pairwise(h, l, axis: int):
    """Compensated sum of a pair array along ``axis`` (log-depth pairwise
    two-sum tree: error ~2^-48 * log2(n), no sequential scan latency).

    The axis length must be a power of two (callers pad with zeros).
    """
    n = h.shape[axis]
    assert n & (n - 1) == 0, f"pairwise sum needs a power-of-two axis, got {n}"
    while h.shape[axis] > 1:
        m = h.shape[axis] // 2
        lo_h = jax.lax.slice_in_dim(h, 0, m, axis=axis)
        hi_h = jax.lax.slice_in_dim(h, m, 2 * m, axis=axis)
        lo_l = jax.lax.slice_in_dim(l, 0, m, axis=axis)
        hi_l = jax.lax.slice_in_dim(l, m, 2 * m, axis=axis)
        h, e = two_sum(lo_h, hi_h)
        l = lo_l + hi_l + e
    return jnp.squeeze(h, axis), jnp.squeeze(l, axis)
