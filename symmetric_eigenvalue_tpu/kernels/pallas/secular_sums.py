"""Pallas TPU kernel: the secular root-finder's per-iteration reductions.

Every iteration of the dlaed4-style "middle way" root finder
(kernels/secular.py:_solve_roots) needs, for each root i in a slot block,
four reductions over all m poles j with dif_ij = (poles_j - shift_i) - tau_i:

    S1[i]  = sum_j z2_j / dif_ij          (secular sum)
    S2[i]  = sum_j z2_j / dif_ij^2        (its derivative)
    S1L[i] = sum_{j <= sl_i} z2_j / dif_ij    (psi / phi split at the root's
    S2L[i] = sum_{j <= sl_i} z2_j / dif_ij^2   own slot, for the quadratic model)

This is the reference's hot loop (secularEquation, eigenvalues.c:8-17, inside
the per-root bisection eigenvalues.c:161-247) — the part the reference times
separately (main.c:677).  The XLA emulated-f64 body materializes ~10
(block, m) f32-pair temporaries in HBM per iteration; here the denominators,
reciprocals and products live in VMEM tiles and the sums fold through
compensation channels at f32 VPU rate.

Precision split: S1/S1L carry the CONVERGENCE TEST (h = tau*D - rho z_s^2),
so they use full double-word arithmetic — exact-by-construction products via
12-bit mask splits (FMA-contraction-proof, see dword_matvec.py) and 3-channel
compensated accumulation, ~2^-46 relative.  S2/S2L only steer the Newton /
rational-model STEP (an error there costs at most one extra iteration, never
accuracy), so they accumulate the plain-f32 terms through a single two-sum
compensation channel (~1e-6 relative) at a third of the flops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cauchy_matmul import split_f64, _two_sum
from .dword_matvec import _mask_split


def _quick_two_sum(a, b):
    """Dekker fast two-sum: requires |a| >= |b| (or a == 0)."""
    s = a + b
    return s, b - (s - a)


def _kernel(ph, plo, z2h, z2l, svh, svl, th, tl, slq, out,
            s1_s, s1_c, s1_cc, l1_s, l1_c, l1_cc, s2_s, s2_c, l2_s, l2_c):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    tj = ph.shape[1]

    @pl.when(j == 0)
    def _():
        for ref in (s1_s, s1_c, s1_cc, l1_s, l1_c, l1_cc,
                    s2_s, s2_c, l2_s, l2_c):
            ref[:] = jnp.zeros_like(ref)

    pj_h = ph[0, :][:, None]          # (TJ, 1) pole block (reduction dim)
    pj_l = plo[0, :][:, None]
    w_h = z2h[0, :][:, None]          # (TJ, 1) z^2 weights
    w_l = z2l[0, :][:, None]
    sv_h = svh[0, :][None, :]         # (1, TI) per-root shift
    sv_l = svl[0, :][None, :]
    tt_h = th[0, :][None, :]
    tt_l = tl[0, :][None, :]

    # den = (p_j - sv_i) - tau_i via ACCURATE double-double subtraction.
    # The sloppy chain (cauchy_rowsum's) only bounds the error by
    # ~2^-48 * |operands| ABSOLUTE; when (p_j - sv_i) nearly cancels tau_i
    # (the bracket pole of a mid-gap root) the denominator needs ~2^-47
    # RELATIVE accuracy or near-pole terms lose ~5 digits (measured 1.6e-11
    # vs the f64 oracle).  Carrying the low-part two_sum error f through two
    # renormalizations restores the relative bound at ~10 extra flops.
    def _dd_sub(ah, al, bh, bl):
        s, e = _two_sum(ah, -bh)
        t, f = _two_sum(al, -bl)
        e = e + t
        s, e = _quick_two_sum(s, e)
        e = e + f
        return _quick_two_sum(s, e)

    ah_, al_ = _dd_sub(pj_h, pj_l, sv_h, sv_l)      # broadcasts to (TJ, TI)
    dh, dl = _dd_sub(ah_, al_, tt_h, tt_l)

    # reciprocal to ~2^-46: r0 + r1 (one exact Newton correction + e^2 term;
    # identical scheme to cauchy_rowsum.py)
    r0 = 1.0 / dh
    d1, d2 = _mask_split(dh)
    q1, q2 = _mask_split(r0)
    t1c = 1.0 - d1 * q1               # exact: d1*q1 in [0.5, 2)
    s_, c_ = _two_sum(t1c, -(d1 * q2))
    s_, e_ = _two_sum(s_, -(d2 * q1))
    c_ = c_ + e_
    s_, e_ = _two_sum(s_, -(d2 * q2))
    c_ = c_ + e_ - dl * r0
    r1 = r0 * s_ + r0 * c_ + r0 * (s_ * s_)

    # t1 = z2 * recip in double-word: exact partial products via mask splits
    m1, m2 = _mask_split(w_h)
    q_, eq = _two_sum(m1 * q2, m2 * q1)
    main, eh = _two_sum(m1 * q1, q_)
    tail = ((m2 * q2 + eq) + eh) + (w_h * r1 + w_l * r0)

    # t2 = t1 / den, plain f32 (steers the step only; see module docstring)
    t2 = (main + tail) * (r0 + r1)

    # left mask: global pole index j <= sl_i
    ti = sv_h.shape[1]
    col = (jax.lax.broadcasted_iota(jnp.int32, (tj, ti), 0)
           + j * tj)
    maskL = col <= slq[0, :][None, :]
    mainL = jnp.where(maskL, main, 0.0)
    tailL = jnp.where(maskL, tail, 0.0)
    t2L = jnp.where(maskL, t2, 0.0)

    a_s1, a_c1, a_cc1 = s1_s[:], s1_c[:], s1_cc[:]
    b_s1, b_c1, b_cc1 = l1_s[:], l1_c[:], l1_cc[:]
    a_s2, a_c2 = s2_s[:], s2_c[:]
    b_s2, b_c2 = l2_s[:], l2_c[:]
    for k in range(tj // 8):
        sk = slice(8 * k, 8 * k + 8)
        a_s1, ea = _two_sum(a_s1, main[sk, :])
        a_c1, eb = _two_sum(a_c1, tail[sk, :] + ea)
        a_cc1 = a_cc1 + eb
        b_s1, ea = _two_sum(b_s1, mainL[sk, :])
        b_c1, eb = _two_sum(b_c1, tailL[sk, :] + ea)
        b_cc1 = b_cc1 + eb
        a_s2, ea = _two_sum(a_s2, t2[sk, :])
        a_c2 = a_c2 + ea
        b_s2, ea = _two_sum(b_s2, t2L[sk, :])
        b_c2 = b_c2 + ea
    s1_s[:], s1_c[:], s1_cc[:] = a_s1, a_c1, a_cc1
    l1_s[:], l1_c[:], l1_cc[:] = b_s1, b_c1, b_cc1
    s2_s[:], s2_c[:] = a_s2, a_c2
    l2_s[:], l2_c[:] = b_s2, b_c2

    @pl.when(j == n_j - 1)
    def _():
        def fold3(s, c, cc):
            c = c + cc
            for half in (4, 2, 1):
                s_new, err = _two_sum(s[:half, :], s[half:2 * half, :])
                c = c[:half, :] + c[half:2 * half, :] + err
                s = s_new
            return _two_sum(s, c)      # renormalized (hi, lo)

        hi, lo = fold3(s1_s[:], s1_c[:], s1_cc[:])
        out[0:1, :] = hi
        out[1:2, :] = lo
        hi, lo = fold3(l1_s[:], l1_c[:], l1_cc[:])
        out[2:3, :] = hi
        out[3:4, :] = lo
        out[4:5, :] = jnp.sum(s2_s[:] + s2_c[:], axis=0, keepdims=True)
        out[5:6, :] = jnp.sum(l2_s[:] + l2_c[:], axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("ti", "tj"))
def _secular_sums_pair(ph, plo, z2h, z2l, svh, svl, th, tl, sl,
                       ti: int, tj: int):
    B = svh.shape[0]
    m = ph.shape[0]
    grid = (B // ti, m // tj)

    def vec(tile, pick):
        return pl.BlockSpec((1, tile), pick, memory_space=pltpu.VMEM)

    with jax.enable_x64(False):  # i64 index-map constants break Mosaic
        out = pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[
                vec(tj, lambda i, j: (0, j)),   # poles hi
                vec(tj, lambda i, j: (0, j)),   # poles lo
                vec(tj, lambda i, j: (0, j)),   # z2 hi
                vec(tj, lambda i, j: (0, j)),   # z2 lo
                vec(ti, lambda i, j: (0, i)),   # shift hi
                vec(ti, lambda i, j: (0, i)),   # shift lo
                vec(ti, lambda i, j: (0, i)),   # tau hi
                vec(ti, lambda i, j: (0, i)),   # tau lo
                vec(ti, lambda i, j: (0, i)),   # sl (int32)
            ],
            out_specs=pl.BlockSpec((6, ti), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((6, B), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, ti), jnp.float32)] * 10,
        )(ph[None, :], plo[None, :], z2h[None, :], z2l[None, :],
          svh[None, :], svl[None, :], th[None, :], tl[None, :],
          sl[None, :].astype(jnp.int32))
    return out


def secular_sums(poles, z2, shift_val, tau, sl, ti: int = 256, tj: int = 512):
    """(S1, S2, S1L, S2L) each (B,) f64 — see module docstring.

    poles/z2: (m,) f64; shift_val/tau: (B,) f64; sl: (B,) int32 global slot
    indices for the left mask.  Requires :func:`supported`(m, B).
    """
    m = poles.shape[0]
    B = shift_val.shape[0]
    dt = tau.dtype
    if B < ti:
        ti = B
    if m < tj:
        tj = m
    ph, plo = split_f64(poles)
    z2h, z2l = split_f64(z2)
    svh, svl = split_f64(shift_val)
    th, tl = split_f64(tau)
    out = _secular_sums_pair(ph, plo, z2h, z2l, svh, svl, th, tl, sl,
                             ti=ti, tj=tj)
    S1 = out[0].astype(dt) + out[1].astype(dt)
    S1L = out[2].astype(dt) + out[3].astype(dt)
    S2 = out[4].astype(dt)
    S2L = out[5].astype(dt)
    return S1, S2, S1L, S2L


def supported(m: int, B: int, ti: int = 256, tj: int = 512) -> bool:
    if B < ti:
        if B % 8 != 0:
            return False
        ti = B
    if m < tj:
        tj = m
    return B % ti == 0 and m % tj == 0 and tj % 8 == 0
