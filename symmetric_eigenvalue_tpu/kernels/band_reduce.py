"""Two-stage SBR, stage 1: dense symmetric -> banded (blocked Householder).

One-stage tridiagonalization (kernels/tridiagonalize.py) is O(n^3) *HBM
traffic*: every column's ``v @ A`` streams the full trailing matrix, which at
n=16384 f64 is ~41 s of pure bandwidth before any arithmetic.  The classic
fix (Bischof-Lang successive band reduction; the role MKL's ``dsytrd`` panel
+ ``dsyrk`` split plays for the reference's LAPACK dependency) reshapes the
reduction so almost all work lands in rank-2b GEMMs on the MXU:

  stage 1 (this file):  A -> B banded with bandwidth b, via QR panels:
      for each block column k (offset o = k*b):
        * Householder QR of the (n-o-b) x b panel A[o+b:, o:o+b] — the only
          column-sequential part, and each step touches an n x b strip, not
          the n x n trailing matrix;
        * two-sided block update  A <- H^T A H,  H = I - Y T Y^T, computed
          as three GEMMs (A@Y, small Gram, fused symmetric rank-2b update).
  stage 2 (band_to_tridiag below): B -> tridiagonal by pipelined bulge
      chasing — O(n^2 b) work on small windows.

Reflectors are stored as ROWS of Yt (row c = reflector annihilating column c
below the band; unit at c+b) with scalar taus, the same convention as
tridiagonalize.Vt shifted by b — so tridiagonalize.apply_q applies Q1 to
eigenvector blocks unchanged (panel=b).

All GEMMs run f64-grade via the MXU-sliced double-word kernel on TPU
(kernels/pallas/dword_matmul); the per-panel work uses full-size (n-wide)
operands with zero-masked reflectors — 3x the FLOPs of perfectly shrinking
trailing windows, bought back many times over by MXU rates (future:
bucketed trailing sizes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .tridiagonalize import _householder, _larft, _mm, _use_dword_matvec


def reduce_to_band(A, band: int = 128):
    """A (n, n) symmetric -> (B (n, n) banded, Yt (n, n), taus (n,)).

    B = Q1^T A Q1 with bandwidth ``band`` (entries |i-j| > band are ~0);
    Q1 = H_0 H_1 ... where H_c = I - tau_c y_c y_c^T, y_c = Yt[c, :]
    (zero at entries < c + band, unit at c + band).
    """
    n = A.shape[0]
    dtype = A.dtype
    b = int(band)
    if n <= b + 1:
        # already "banded"; no reflectors needed
        return A, jnp.zeros((n, n), dtype), jnp.zeros((n,), dtype)
    use_dword = _use_dword_matvec(n, dtype)

    num_panels = max((n - 2) // b, 0)   # last <=b+1 columns are inside band

    Yt = jnp.zeros((n, n), dtype)
    taus = jnp.zeros((n,), dtype)

    def panel_body(k, carry):
        A, Yt, taus = carry
        o = k * b

        # --- panel QR: Householder columns of A[o+b:, o:o+b] ------------
        # Pt[j] = (current) column o+j of A, reflectors applied immediately
        # to the remaining panel columns (one-sided).
        Pt = lax.dynamic_slice(A.T, (o, 0), (b, n))   # rows: panel columns
        Yp = jnp.zeros((b, n), dtype)
        tp = jnp.zeros((b,), dtype)

        def col_body(j, inner):
            Pt, Yp, tp = inner
            x = Pt[j]
            # unit position u = o + b + j  ->  _householder pivot index u
            v, tau, _ = _householder(x, o + b + j - 1, n)
            live = o + b + j < n
            v = jnp.where(live, v, jnp.zeros_like(v))
            tau = jnp.where(live, tau, 0.0)
            # apply (I - tau v v^T) to the remaining panel columns
            w = Pt @ v                     # (b,)
            Pt = Pt - tau * w[:, None] * v[None, :]
            Yp = lax.dynamic_update_slice(Yp, v[None, :], (j, 0))
            tp = tp.at[j].set(tau)
            return Pt, Yp, tp

        _, Yp, tp = lax.fori_loop(0, b, col_body, (Pt, Yp, tp))

        # --- two-sided block update  A <- (I - Y T Y^T)^T A (I - Y T Y^T)
        T = _larft(Yp, tp, use_dword)                    # (b, b) upper
        P_ = _mm(A, Yp.T, use_dword)                     # (n, b) = A Y
        # Y^T A Y: n-length contraction — XLA's emulated-f64 matrix-matrix
        # dot is only ~1e-6-grade at these lengths on TPU (CLAUDE.md), so
        # this must ride the double-word kernel too
        S = _mm(Yp, P_, use_dword, tm=32, tn=32)         # (b, b) = Y^T A Y
        W = P_ @ T - (0.5 * (Yp.T @ (T.T @ S @ T)).T).T  # (n, b)
        # A -= Y W^T + W Y^T  as one fused (n, 2b) x (2b, n) GEMM
        A = A - _mm(jnp.concatenate([Yp.T, W], axis=1),
                    jnp.concatenate([W, Yp.T], axis=1).T, use_dword)

        Yt = lax.dynamic_update_slice(Yt, Yp, (o, 0))
        taus = lax.dynamic_update_slice(taus, tp, (o,))
        return A, Yt, taus

    A, Yt, taus = lax.fori_loop(0, num_panels, panel_body, (A, Yt, taus))
    return A, Yt, taus
