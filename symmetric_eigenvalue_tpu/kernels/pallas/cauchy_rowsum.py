"""Pallas TPU kernel: fused Cauchy generation + f64-grade row-weighted sums.

The upsweep pushes each subtree's first/last boundary rows through a merge
(kernels/assemble.py:rows_through_merge, the reference's 'only two rows
travel' trick, main.c:583-595):

    S[r, i] = sum_j wz[r, j] / ((poles_j - shift_i) - tau_i)

The XLA path generates the (m, B) reciprocal blocks in emulated f64
(~60-170 ms per tree level at n=16384).  This kernel builds the denominators
in VMEM with double-f32 pair arithmetic (the pole differences cancel and
need the two-sum corrections), refines the f32 reciprocal with one exact
Newton correction, and folds the weighted terms through three compensation
channels — f64-grade sums at f32 bandwidth.  The result feeds the *next*
level's z-vector, so full working precision here is what keeps the
1e-12*||T|| residual target intact (z errors are backward errors on the
merged operator).

All products that must round deterministically are made exact via 12-bit
mask splits (see dword_matvec.py: compilers may contract mul+add chains).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cauchy_matmul import split_f64, _two_sum
from .dword_matvec import _mask_split

_R = 2        # boundary rows per call (the upsweep's first/last rows)


def _kernel(ph, plo, svh, svl, th, tl, wzh, wzl, out, acc_s, acc_c, acc_cc):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_s[:] = jnp.zeros_like(acc_s)
        acc_c[:] = jnp.zeros_like(acc_c)
        acc_cc[:] = jnp.zeros_like(acc_cc)

    pj_h = ph[0, :][:, None]          # (TJ, 1) pole block (reduction dim)
    pj_l = plo[0, :][:, None]
    sv_h = svh[0, :][None, :]         # (1, TI) root-shift block (output dim)
    sv_l = svl[0, :][None, :]
    tt_h = th[0, :][None, :]
    tt_l = tl[0, :][None, :]

    # den = (p_j - sv_i) - tau_i in double-f32 (cancellation-safe)
    s1, e1 = _two_sum(pj_h, -sv_h)
    e1 = e1 + (pj_l - sv_l)
    s2, e2 = _two_sum(s1, -tt_h)
    e2 = e2 + (e1 - tt_l)
    dh = s2 + e2
    dl = e2 - (dh - s2)

    # reciprocal to ~2^-46: r0 + r1 with one exact Newton correction
    r0 = 1.0 / dh
    d1, d2 = _mask_split(dh)
    q1, q2 = _mask_split(r0)
    t1 = 1.0 - d1 * q1                # exact: d1*q1 in [0.5, 2)
    s_, c_ = _two_sum(t1, -(d1 * q2))
    s_, e_ = _two_sum(s_, -(d2 * q1))
    c_ = c_ + e_
    s_, e_ = _two_sum(s_, -(d2 * q2))
    c_ = c_ + e_ - dl * r0
    # second-order term: recip = r0 (1 + e + e^2 + ...); without e^2 the
    # reciprocal is only ~2^-46 and the accumulated boundary-row error
    # reaches ~4e-13*||T|| at n=16384 (measured vs the analytic Poisson
    # spectrum) — the e^2 term restores the platform's 2^-47..48 floor
    r1 = r0 * s_ + r0 * c_ + r0 * (s_ * s_)

    ti = pj_h.shape[0]
    for r in range(_R):
        wh = wzh[r, :][:, None]       # (TJ, 1)
        wl = wzl[r, :][:, None]
        m1, m2 = _mask_split(wh)
        # all partial products are exact (12x12-bit significands), so no
        # compiler FMA contraction can change any value — never form the
        # rounded wh*r0 (see dword_matvec.py; the Dekker-style error
        # reconstruction is exactly what contraction silently breaks)
        q_, eq = _two_sum(m1 * q2, m2 * q1)
        main, eh = _two_sum(m1 * q1, q_)
        tail = ((m2 * q2 + eq) + eh) + (wh * r1 + wl * r0)
        s = acc_s[r * 8:(r + 1) * 8, :]
        c = acc_c[r * 8:(r + 1) * 8, :]
        cc = acc_cc[r * 8:(r + 1) * 8, :]
        for k in range(ti // 8):
            mk = main[8 * k:8 * k + 8, :]
            tk = tail[8 * k:8 * k + 8, :]
            s, ea = _two_sum(s, mk)
            c, eb = _two_sum(c, tk + ea)
            cc = cc + eb
        acc_s[r * 8:(r + 1) * 8, :] = s
        acc_c[r * 8:(r + 1) * 8, :] = c
        acc_cc[r * 8:(r + 1) * 8, :] = cc

    @pl.when(j == n_j - 1)
    def _():
        for r in range(_R):
            s = acc_s[r * 8:(r + 1) * 8, :]
            c = acc_c[r * 8:(r + 1) * 8, :] + acc_cc[r * 8:(r + 1) * 8, :]
            for half in (4, 2, 1):
                s_new, err = _two_sum(s[:half, :], s[half:2 * half, :])
                c = c[:half, :] + c[half:2 * half, :] + err
                s = s_new
            hi, lo = _two_sum(s, c)
            out[r:r + 1, :] = hi
            out[_R + r:_R + r + 1, :] = lo


@functools.partial(jax.jit, static_argnames=("ti", "tj"))
def cauchy_rowsum(poles, shift_val, tau, wz, ti: int = 512, tj: int = 256):
    """S (r, m) f64 = sum_j wz[:, j] / ((poles_j - shift_i) - tau_i).

    poles/shift_val/tau: f64 (m,); wz: f64 (r, m) with r <= _R.
    m must satisfy :func:`supported` (full-m tiles below ti).
    """
    m = poles.shape[0]
    r = wz.shape[0]
    dt = wz.dtype
    if m < ti:
        ti = tj = m
    ph, plo = split_f64(poles)
    svh, svl = split_f64(shift_val)
    th, tl = split_f64(tau)
    wzp = wz if r == _R else jnp.concatenate(
        [wz, jnp.zeros((_R - r, m), dt)], axis=0)
    wzh, wzl = split_f64(wzp)

    grid = (m // ti, m // tj)

    def vec(tile, pick):
        return pl.BlockSpec((1, tile), pick, memory_space=pltpu.VMEM)

    with jax.enable_x64(False):
        out = pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[
                vec(tj, lambda i, j: (0, j)),   # poles hi
                vec(tj, lambda i, j: (0, j)),   # poles lo
                vec(ti, lambda i, j: (0, i)),   # shift hi
                vec(ti, lambda i, j: (0, i)),   # shift lo
                vec(ti, lambda i, j: (0, i)),   # tau hi
                vec(ti, lambda i, j: (0, i)),   # tau lo
                pl.BlockSpec((_R, tj), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),   # wz hi
                pl.BlockSpec((_R, tj), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),   # wz lo
            ],
            out_specs=pl.BlockSpec((2 * _R, ti), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2 * _R, m), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8 * _R, ti), jnp.float32)] * 3,
        )(ph[None, :], plo[None, :], svh[None, :], svl[None, :],
          th[None, :], tl[None, :], wzh, wzl)
    return out[:r].astype(dt) + out[_R:_R + r].astype(dt)


def supported(m: int, r: int, ti: int = 512, tj: int = 256) -> bool:
    if r > _R:
        return False
    if m < ti:
        return m % 8 == 0
    return m % ti == 0 and m % tj == 0
