"""Eigenvector refinement: batched shifted tridiagonal solves (inverse iteration).

Enables the mixed-precision pipeline: the downsweep's big matmuls run in f32
(full MXU rate), then ONE f64 inverse-iteration step per eigenpair restores
residuals to working precision — (T - lam_i I) y_i = v_i is a tridiagonal solve,
O(n) per vector, all n vectors solved simultaneously as (K,)-wide lanes of two
lax.scans (a partial-pivoting LU forward pass fused with the rhs, then back
substitution).  This is the LAPACK ``dgttrf``/``dgttrs`` pair vectorized over
shifts, plus dstein-style cluster re-orthonormalization handled by the driver.
"""

from __future__ import annotations

import functools
import os
import time as _time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def solve_shifted_tridiagonal(d, e, lam, B):
    """Solve (T - lam_i I) x_i = B[:, i] for every i simultaneously.

    d (n,), e (n-1,), lam (K,), B (n, K) -> X (n, K).
    Partial pivoting between adjacent rows (safe for the near-singular systems
    inverse iteration wants); exact-zero pivots are nudged by eps*||T||.
    """
    n = d.shape[0]
    K = lam.shape[0]
    dtype = B.dtype
    if n == 1:
        piv = d[0] - lam
        piv = jnp.where(piv == 0, 1e-30, piv)
        return B / piv[None, :]

    scale = jnp.max(jnp.abs(d)) + 2.0 * jnp.max(jnp.abs(e))
    tiny = jnp.asarray(2.0 ** -48, dtype) * jnp.maximum(scale, 1e-30)

    e_ext = jnp.concatenate([e, jnp.zeros((1,), dtype)])

    def clamp(piv):
        # magnitude floor, not just exact-zero: a ~1e-20 pivot amplifies the
        # solution past the f32 exponent range of TPU-emulated f64 (x^2 in the
        # norm would overflow-to-NaN); eps*||T|| is the dstein-style nudge
        return jnp.where(jnp.abs(piv) < tiny,
                         jnp.where(piv < 0, -tiny, tiny), piv)

    def fwd(carry, inp):
        a, c, r = carry                   # current row: diag, super, rhs (K,)
        sub, a0_next, c0_next, r_next = inp
        swap = jnp.abs(sub) > jnp.abs(a)
        piv = jnp.where(swap, sub, a)
        piv = clamp(piv)
        m = jnp.where(swap, a / piv, sub / piv)
        # stored U row j and transformed rhs row j
        ud = piv
        u1 = jnp.where(swap, a0_next, c)
        u2 = jnp.where(swap, c0_next, jnp.zeros_like(c))
        r_j = jnp.where(swap, r_next, r)
        # next carried row
        a_new = jnp.where(swap, c - m * a0_next, a0_next - m * c)
        c_new = jnp.where(swap, -m * c0_next, c0_next)
        r_new = jnp.where(swap, r - m * r_next, r_next - m * r)
        return (a_new, c_new, r_new), (ud, u1, u2, r_j)

    a0 = d[0] - lam
    c0 = jnp.broadcast_to(e_ext[0], (K,)).astype(dtype)
    r0 = B[0]
    subs = e                                   # (n-1,)
    a_next = d[1:, None] - lam[None, :]        # (n-1, K)
    c_next = jnp.broadcast_to(e_ext[1:, None], (n - 1, K)).astype(dtype)
    r_next = B[1:]
    (a_f, _, r_f), (ud, u1, u2, rr) = lax.scan(
        fwd, (a0, c0, r0),
        (subs, a_next, c_next, r_next))

    a_f = clamp(a_f)
    x_last = r_f / a_f

    # Scaled back substitution: x_j = (r_j - u1_j x_{j+1} - u2_j x_{j+2})/ud_j.
    # Inverse-iteration solutions can cascade-grow past the f32 exponent range
    # of TPU-emulated f64 (two tiny pivots in sequence -> 1e30+), so each
    # system carries a power-of-two scale: rows are emitted at local scale
    # 2^-s_j and recombined underflow-safely afterwards (entries more than
    # ~2^-120 below the peak are genuinely negligible post-normalization).
    two_m30 = jnp.asarray(2.0 ** -30, dtype)
    two_m40 = jnp.asarray(2.0 ** -40, dtype)
    one = jnp.ones((), dtype)

    def bwd(carry, inp):
        # g = 2^-s carried directly (underflow of g simply drops r-terms that
        # are ~2^-106 below the peak — negligible after normalization); the
        # tiered select-based rescale avoids per-step transcendentals
        x1, x2, s, g = carry
        ud_j, u1_j, u2_j, r_j = inp
        x = (r_j * g - u1_j * x1 - u2_j * x2) / ud_j
        mag = jnp.abs(x)
        f1 = jnp.where(mag > 2.0 ** 20, two_m30, one)
        f2 = jnp.where(mag > 2.0 ** 50, two_m30, one)
        f3 = jnp.where(mag > 2.0 ** 80, two_m40, one)
        fac = f1 * f2 * f3
        shift = (jnp.where(mag > 2.0 ** 20, 30.0, 0.0)
                 + jnp.where(mag > 2.0 ** 50, 30.0, 0.0)
                 + jnp.where(mag > 2.0 ** 80, 40.0, 0.0))
        x = x * fac
        x1 = x1 * fac
        g = g * fac
        s = s + shift
        return (x, x1, s, g), (x, s)

    s0 = jnp.zeros_like(x_last)
    (_, _, _, _), (xs, ss) = lax.scan(
        bwd, (x_last, jnp.zeros_like(x_last), s0, jnp.ones_like(x_last)),
        (ud, u1, u2, rr), reverse=True)
    xs = jnp.concatenate([xs, x_last[None, :]], axis=0)
    ss = jnp.concatenate([ss, s0[None, :]], axis=0)
    s_max = jnp.max(ss, axis=0, keepdims=True)
    return xs * jnp.exp2(ss - s_max)


def _block_lu_solve(db, eb, lam, rhs, tiny):
    """Pivoted LU solve of every block system (T_b - lam_i I) x = rhs.

    db (P, nb), eb (P, nb-1): per-block tridiagonal bands; lam (K,); rhs
    (P, nb, R, K) — R right-hand sides *sharing* each column's shift, so the
    LU factors are computed (and stored) once.  Partial pivoting between
    adjacent rows *within* each block; pivots clamped at +-tiny.  Returns the
    true (unscaled) solutions — block lengths are short (nb ~ 128), so even a
    clamped-pivot blowup stays at ~1/eps ~ 2^48 and a double cascade at
    2^96, comfortably inside the f64 range; per-step soft clamps bound the
    pathological triple-cascade case.
    """
    P, nb = db.shape
    K = lam.shape[0]
    dtype = rhs.dtype
    big = jnp.asarray(2.0 ** 80, dtype)

    def clamp_piv(piv):
        return jnp.where(jnp.abs(piv) < tiny,
                         jnp.where(piv < 0, -tiny, tiny), piv)

    e_ext = jnp.concatenate([eb, jnp.zeros((P, 1), dtype)], axis=1)

    def fwd(carry, inp):
        a, c, r = carry          # (P, K) diag/super; (P, R, K) rhs of row j
        sub, a0n, c0n, rn = inp
        swap = jnp.abs(sub) > jnp.abs(a)
        piv = clamp_piv(jnp.where(swap, sub, a))
        mlt = jnp.where(swap, a / piv, sub / piv)
        ud = piv
        u1 = jnp.where(swap, a0n, c)
        u2 = jnp.where(swap, c0n, jnp.zeros_like(c))
        sw = swap[:, None, :]
        ml = mlt[:, None, :]
        r_j = jnp.where(sw, rn, r)
        a_new = jnp.where(swap, c - mlt * a0n, a0n - mlt * c)
        c_new = jnp.where(swap, -mlt * c0n, c0n)
        r_new = jnp.where(sw, r - ml * rn, rn - ml * r)
        return (a_new, c_new, r_new), (ud, u1, u2, r_j)

    a0 = db[:, 0, None] - lam[None, :]                      # (P, K)
    c0 = jnp.broadcast_to(e_ext[:, 0, None], (P, K)).astype(dtype)
    r0 = rhs[:, 0]                                          # (P, R, K)
    # lam-independent per-row bands ride as (P, 1) and broadcast in the body
    subs = jnp.moveaxis(eb[:, :, None], 1, 0)               # (nb-1, P, 1)
    d_rows = jnp.moveaxis(db[:, 1:, None], 1, 0)
    c_rows = jnp.moveaxis(e_ext[:, 1:, None], 1, 0)
    r_next = jnp.moveaxis(rhs[:, 1:], 1, 0)                 # (nb-1, P, R, K)

    def fwd_wrap(carry, inp):
        sub, d_j, c_j, rn = inp
        return fwd(carry, (sub, d_j - lam[None, :], c_j, rn))

    # unroll: the scan body is a handful of fused elementwise kernels, and
    # on TPU each in-jit kernel launch costs ~0.1 ms regardless of operand
    # size (CLAUDE.md) — at nb=96 / K=1 (the risky-column extra pass) the
    # solve was ~0.2 s of pure launch latency.  Unrolling fuses 8 rows per
    # launch; the arithmetic is identical (no reassociation across rows —
    # every step's ops still depend sequentially on the carry).
    (a_f, _, r_f), (ud, u1, u2, rr) = lax.scan(
        fwd_wrap, (a0, c0, r0), (subs, d_rows, c_rows, r_next), unroll=8)

    x_last = r_f / clamp_piv(a_f)[:, None, :]

    def bwd(carry, inp):
        x1, x2 = carry
        ud_j, u1_j, u2_j, r_j = inp
        x = (r_j - u1_j[:, None, :] * x1 - u2_j[:, None, :] * x2) \
            / ud_j[:, None, :]
        x = jnp.clip(x, -big, big)
        return (x, x1), x

    x_last = jnp.clip(x_last, -big, big)
    (_, _), xs = lax.scan(bwd, (x_last, jnp.zeros_like(x_last)),
                          (ud, u1, u2, rr), reverse=True, unroll=8)
    xs = jnp.concatenate([xs, x_last[None]], axis=0)    # (nb, P, R, K)
    return jnp.moveaxis(xs, 0, 1)                       # (P, nb, R, K)


def solve_shifted_tridiagonal_blocked(d, e, lam, B, nb: int = 128):
    """Spike-style partitioned solve of (T - lam_i I) x_i = B[:, i].

    The sequential LU scan of :func:`solve_shifted_tridiagonal` is
    latency-bound on TPU — n scan steps cost ~2.2 s at n=16384 and ~9 s at
    n=65536 per refinement pass.  This runs the same pivoted elimination
    *within* P = n/nb independent row blocks (scan length nb, vmapped across
    blocks x columns: full VPU width), couples the blocks through a 2x2
    block-tridiagonal interface system in the blocks' first/last entries
    (scan length P), and reconstructs interiors in one vectorized pass:

        x_b = u_b - p_b * L_{b-1} - q_b * F_{b+1}

    where u/p/q solve the block system against (rhs, e1*e_top, e_nb*e_bot).
    Replaces the reference-era sequential structure the same way the
    conquer/backtransformation replaced row pipelines: latency -> bandwidth.
    """
    n = d.shape[0]
    K = lam.shape[0]
    dtype = B.dtype
    scale = jnp.max(jnp.abs(d)) + 2.0 * jnp.max(jnp.abs(e))
    tiny = jnp.asarray(2.0 ** -48, dtype) * jnp.maximum(scale, 1e-30)

    pad = (-n) % nb
    npad = n + pad
    if pad:
        # decoupled, well-conditioned pad rows: large diagonal, zero rhs,
        # zero coupling at the seam (e[n-1] lands in the zero extension)
        dbig = 4.0 * scale + 4.0
        d = jnp.concatenate([d, jnp.full((pad,), dbig, dtype)])
        B = jnp.concatenate([B, jnp.zeros((pad, K), dtype)], axis=0)

    P = npad // nb
    db = d.reshape(P, nb)
    # npad band entries: npad-1 real slots (intra-block bands + the P-1
    # cross-block couplers at positions b*nb + nb-1) plus one trailing zero
    e_all = jnp.concatenate(
        [e, jnp.zeros((npad - e.shape[0],), dtype)]).reshape(P, nb)
    eb = e_all[:, : nb - 1]                      # intra-block bands
    e_cross = e_all[:, nb - 1]                   # (P,) coupler below block b

    # three right-hand sides per block, sharing each column's shift: the rhs
    # itself, and unit loads at the first/last row (responses to the
    # neighbor couplers)
    unit_f = jnp.zeros((P, nb, 1, 1), dtype).at[:, 0, 0, 0].set(1.0)
    unit_l = jnp.zeros((P, nb, 1, 1), dtype).at[:, nb - 1, 0, 0].set(1.0)
    rhs = jnp.concatenate(
        [B.reshape(P, nb, 1, K),
         jnp.broadcast_to(unit_f, (P, nb, 1, K)),
         jnp.broadcast_to(unit_l, (P, nb, 1, K))], axis=2)
    sol = _block_lu_solve(db, eb, lam, rhs, tiny)
    u = sol[:, :, 0]
    # p_b: response to x[first-1] through coupler e_cross[b-1];
    # q_b: response to x[last+1] through coupler e_cross[b]
    ec_above = jnp.concatenate([jnp.zeros((1,), dtype), e_cross[:-1]])
    p = sol[:, :, 1] * ec_above[:, None, None]
    q = sol[:, :, 2] * e_cross[:, None, None]

    # interface unknowns y_b = (F_b, L_b) = x at block b's first/last row:
    #   y_b + Lo_b y_{b-1} + Up_b y_{b+1} = u_b(first/last)
    # with Lo_b = [[0, pf], [0, pl]], Up_b = [[qf, 0], [ql, 0]].
    F, L = interface_solve(p[:, 0, :], p[:, nb - 1, :],
                           q[:, 0, :], q[:, nb - 1, :],
                           u[:, 0, :], u[:, nb - 1, :])

    # reconstruct interiors: x_b = u_b - p_b L_{b-1} - q_b F_{b+1}
    L_above = jnp.concatenate([jnp.zeros((1, K), dtype), L[:-1]], axis=0)
    F_below = jnp.concatenate([F[1:], jnp.zeros((1, K), dtype)], axis=0)
    x = u - p * L_above[:, None, :] - q * F_below[:, None, :]
    return x.reshape(npad, K)[:n]


def interface_solve(pf, pl_, qf, ql, uf, ul):
    """The Spike interface system: 2x2 block-tridiagonal solve over blocks.

    Inputs are each block's boundary responses (P, K): p*/q* the scaled unit
    responses at the first/last row, u* the rhs responses.  Returns
    (F, L) (P, K) — the solution's value at every block's first/last row.
    Shared by the XLA solver above and the Pallas Spike kernels
    (pallas/spike_solve.py)."""
    dtype = uf.dtype
    K = uf.shape[1]
    tiny2 = jnp.asarray(2.0 ** -96, dtype)

    def inv2(a, b, c, dd):
        det = a * dd - b * c
        det = jnp.where(jnp.abs(det) < tiny2,
                        jnp.where(det < 0, -tiny2, tiny2), det)
        return dd / det, -b / det, -c / det, a / det

    def fwd(carry, inp):
        # carry: G_{b-1} (2x2), h_{b-1} (2,) per column
        g11, g12, g21, g22, h1, h2 = carry
        pf_b, pl_b, qf_b, ql_b, uf_b, ul_b = inp
        # D_b = I - Lo_b G_{b-1}; Lo_b = [[0, pf],[0, pl]]
        d11 = 1.0 - pf_b * g21
        d12 = -pf_b * g22
        d21 = -pl_b * g21
        d22 = 1.0 - pl_b * g22
        i11, i12, i21, i22 = inv2(d11, d12, d21, d22)
        # rhs_b = u_b - Lo_b h_{b-1}
        r1 = uf_b - pf_b * h2
        r2 = ul_b - pl_b * h2
        h1n = i11 * r1 + i12 * r2
        h2n = i21 * r1 + i22 * r2
        # G_b = D_b^{-1} Up_b; Up_b = [[qf, 0],[ql, 0]]
        g11n = i11 * qf_b + i12 * ql_b
        g21n = i21 * qf_b + i22 * ql_b
        z = jnp.zeros_like(g11n)
        return ((g11n, z, g21n, z, h1n, h2n), (g11n, g21n, h1n, h2n))

    z0 = jnp.zeros((K,), dtype)
    # unroll=8: same launch-latency amortization as _block_lu_solve — the
    # interface scan runs P = n/nb sequential 2x2 steps
    (_, (G11, G21, H1, H2)) = lax.scan(
        fwd, (z0, z0, z0, z0, z0, z0),
        (pf, pl_, qf, ql, uf, ul), unroll=8)

    def bwd(carry, inp):
        f_next = carry                      # F_{b+1}
        g11_b, g21_b, h1_b, h2_b = inp
        # y_b = h_b - G_b y_{b+1}; G_b has only its first column nonzero
        F_b = h1_b - g11_b * f_next
        L_b = h2_b - g21_b * f_next
        return F_b, (F_b, L_b)

    _, (F, L) = lax.scan(bwd, z0, (G11, G21, H1, H2), reverse=True,
                         unroll=8)
    return F, L


def inverse_iteration(d, e, lam, V, steps: int = 1, block: int = 128):
    """Refine eigenvector columns by ``steps`` inverse-iteration passes.

    V may arrive in float32 (mixed-precision downsweep); the solves run in the
    dtype of (d, e).  Columns are re-normalized each step (max-prescaled so
    the norm's squares stay inside the platform f64's f32 exponent range).
    Systems with n >= 512 use the Spike-style partitioned solver.
    """
    dtype = d.dtype
    n = d.shape[0]
    X = V.astype(dtype)
    for _ in range(steps):
        if n >= 512:
            X = solve_shifted_tridiagonal_blocked(d, e, lam, X, nb=block)
        else:
            X = solve_shifted_tridiagonal(d, e, lam, X)
        mx = jnp.maximum(jnp.max(jnp.abs(X), axis=0, keepdims=True), 1e-30)
        X = X / mx
        X = X / jnp.linalg.norm(X, axis=0, keepdims=True)
    return X


def cluster_segments(lam, gap_tol):
    """Host-side: contiguous index ranges of eigenvalues closer than gap_tol.

    Returns a list of (start, stop) python ints with stop-start >= 2 — the
    groups whose refined vectors need re-orthonormalization (dstein-style).
    """
    import numpy as np
    lam = np.asarray(lam)
    segs = []
    start = 0
    for i in range(1, lam.shape[0] + 1):
        if i == lam.shape[0] or lam[i] - lam[i - 1] > gap_tol:
            if i - start >= 2:
                segs.append((start, i))
            start = i
    return segs


_MAX_BATCH_W = 256
# Per-dispatch budget for the batched cluster-orth gather S (n, g2, w2) f64:
# bytes cap on n*g2*w2*8 (and a floor so tiny n still batch usefully).
_BATCH_BUDGET_BYTES = 1 << 29
_MIN_BUDGET_COLS = 512


@functools.lru_cache(maxsize=16)
def _compiled_wide_orth(n: int, w: int, tpu_f64: bool):
    """CholeskyQR of ONE oversized segment (w > _MAX_BATCH_W) in one dispatch.

    Wide segments happen when the explicit-orthogonalization band
    (ortho_gap_factor..risky band, see SolverConfig) sweeps up a long run of
    consecutive tight gaps — e.g. the ~320 lowest/highest columns of the
    Poisson spectrum, whose neighbor gaps grow only linearly.  A host-side
    ``jnp.linalg.qr`` on (n, w) emulated-f64 operands costs seconds; one
    Gram + triangular solve is milliseconds.  Same a-priori Gershgorin
    acceptance as the batched path: err < 0.1 bounds cond(G) so one
    CholeskyQR reaches ~n*u orthogonality; the caller falls back to
    explicit QR when it fails."""

    def fn(S):
        if tpu_f64:
            # XLA's emulated-f64 matrix-matrix dot is only ~1e-6-grade at
            # these contraction lengths (see the batched gram note above);
            # route through the MXU-sliced double-word GEMM.
            from .pallas.dword_matmul import dword_matmul
            G = dword_matmul(S.T, S)
        else:
            G = jax.lax.dot_general(
                S, S, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)
        L = jnp.linalg.cholesky(G)
        Y = jax.lax.linalg.triangular_solve(
            L, S, left_side=False, lower=True, transpose_a=True)
        err = jnp.max(jnp.sum(jnp.abs(G - jnp.eye(w, dtype=S.dtype)), axis=1))
        ok = jnp.all(jnp.isfinite(Y)) & (err < 0.1)
        return ok, Y

    return jax.jit(fn)


def _gram_reduce(S):
    """Per-segment Grams (nseg, w, w) of S (nseg, n, w) as ONE fused
    broadcast-mul reduction.

    For narrow segments (the bulk: width-2..8 buckets of the
    orthonormalization band) this replaces the stacked dword cross-Gram:
    XLA's emulated-f64 REDUCTIONS are accurate at any length (CLAUDE.md) —
    only its matrix-matrix dot is ~1e-6-grade — and the fused reduce never
    materializes the (nseg, n, w, w) product, so it is bandwidth-bound
    (~5 ms) where the dword route cost ~0.14 s per dispatch (measured: the
    wide band put ortho_mid at 0.75 s of the n=16384 headline)."""
    return jnp.sum(S[:, :, :, None] * S[:, :, None, :], axis=1)


@functools.lru_cache(maxsize=32)
def _compiled_cluster_orth(n: int, nseg: int, wmax: int):
    """Batched CholeskyQR over every cluster segment in one dispatch.

    After refinement the cluster columns are near-orthonormal (Gram = I+eps),
    so cond(S)~1 and a single CholeskyQR reaches working-precision
    orthogonality — no per-segment QR dispatches.  Pad columns carry an
    identity Gram block and pass through untouched.

    COMPUTE-ONLY: returns the orthonormalized columns as a compact
    (n, nseg*wmax) block plus per-segment acceptance flags; the caller
    merges every bucket's output into V in ONE deferred writeback.  The
    previous per-dispatch ``jnp.where`` writeback re-read and re-wrote the
    full (n, C) f64 V (2.1 GB at n=16384) and materialized a (C, n)
    replacement gather EVERY dispatch — ~6 GB of HBM traffic per bucket —
    and the per-dispatch ``np.asarray(seg_ok)`` fetch added a ~33 ms
    tunnel round-trip each; together they were most of the 0.59 s
    ortho_mid phase of the n=16384 headline."""

    return jax.jit(functools.partial(cluster_orth_body,
                                     nseg=nseg, wmax=wmax))


def _cluster_gram(S, nseg: int, wmax: int):
    """Per-segment Grams (nseg, wmax, wmax) from S (nseg, n, wmax).

    On TPU the plain f64 einsum is NOT usable: XLA's emulated-f64
    dot_general is only ~1e-6-grade for matrix-matrix shapes at these
    contraction lengths (measured: 3.6e-7 abs at K=4096, 2.9e-6 at
    K=16384 — the exact magnitude of the round-2 "Poisson 5e-6
    blemish", which was this platform defect corrupting the
    CholeskyQR Gram, not inverse-iteration mixing).  Route through the
    MXU-sliced double-word GEMM on the horizontally stacked segment
    matrix and take the block diagonal; cross-segment blocks are
    wasted flops but the kernel runs at ~4 TFLOP/s-grade so the whole
    Gram costs ~0.1 s at the clustered-bench shape."""
    if jax.default_backend() != "tpu" or S.dtype != jnp.float64:
        return jnp.einsum("bnw,bnv->bwv", S, S)
    if wmax <= 8:
        return _gram_reduce(S)
    from .pallas.dword_matmul import dword_matmul
    # group segments so the stacked width stays bounded (the full
    # cross-Gram is (g*wmax)^2 f64)
    gsz = max(1, min(nseg, 4096 // max(wmax, 1)))
    outs = []
    for o in range(0, nseg, gsz):
        g = min(gsz, nseg - o)
        X = jnp.moveaxis(S[o:o + g], 0, 1).reshape(S.shape[1], g * wmax)
        Gf = dword_matmul(X.T, X).reshape(g, wmax, g, wmax)
        outs.append(Gf[jnp.arange(g), :, jnp.arange(g), :])
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def cluster_orth_body(V, starts, widths, *, nseg: int, wmax: int):
    """Traceable batched-CholeskyQR body (segment-major output layout);
    composable inside larger jits (the driver's fused small-n
    backtransformation) as well as via `_compiled_cluster_orth`."""
    n = V.shape[0]
    cols = starts[:, None] + jnp.arange(wmax)[None, :]       # (nseg, wmax)
    colmask = jnp.arange(wmax)[None, :] < widths[:, None]
    cols_safe = jnp.clip(cols, 0, V.shape[1] - 1)
    S = V[:, cols_safe]                   # (n, nseg, wmax)
    S = jnp.moveaxis(S, 0, 1) * colmask[:, None, :]
    G = _cluster_gram(S, nseg, wmax)
    eye_pad = jnp.where(colmask, 0.0, 1.0)
    G = G + jnp.eye(wmax, dtype=V.dtype)[None] * eye_pad[:, :, None]
    L = jnp.linalg.cholesky(G)
    Y = jax.lax.linalg.triangular_solve(
        L, S, left_side=False, lower=True, transpose_a=True)
    # Guard: a (near-)singular Gram — columns the refinement could not
    # separate — makes cholesky yield NaN, or finite Y with orthogonality
    # only ~cond(S)^2*eps.  Acceptance is decided A-PRIORI from G itself:
    # Gershgorin row sums bound cond(G) <= (1+err)/(1-err), and one
    # floating-point CholeskyQR of a full-rank S returns orthogonality
    # ~cond(G)*n*u (u ~ 2^-48 here), so err < 0.1 guarantees <= ~n*u
    # ~1e-10 at the flagship n — no second n-contraction Gram needed
    # (it cost as much as the first; platform-corruption detection lives
    # in the bench's post-hoc max_ortho_error instead).  Segments that
    # fail keep their original columns; the caller runs explicit QR.
    err = jnp.max(jnp.sum(jnp.abs(
        G - jnp.eye(wmax, dtype=V.dtype)[None]), axis=2), axis=1)
    seg_ok = jnp.all(jnp.isfinite(Y), axis=(1, 2)) & (err < 0.1)
    Yflat = jnp.moveaxis(Y, 0, 1).reshape(n, nseg * wmax)
    return Yflat, seg_ok


@functools.lru_cache(maxsize=32)
def _compiled_cluster_orth_narrow(n: int, nseg: int, w: int):
    """Position-major batched CholeskyQR for narrow segments (w <= 8).

    Same contract as `_compiled_cluster_orth` but every device operand is
    (n, nseg) with the SEGMENT index in the lane dim.  The batched
    (nseg, n, w) formulation puts w (2..8) in the lanes — which the TPU
    tiles to 128 (up to 64x register/layout bloat) — and pays two full
    transposes; the measured w=2 bucket cost 0.30 s of the n=16384
    headline.  Here the w x w Gram, its Cholesky (Crout) and the forward
    substitution unroll in PYTHON over w (<= w(w+1)/2 = 36 terms), so the
    device program is pure (n, nseg) elementwise work + sublane-axis
    reductions — all layouts native.  XLA's emulated-f64 REDUCTIONS are
    accurate at any length (CLAUDE.md; only matrix-matrix dots are
    ~1e-6-grade), so no double-word kernel is needed.

    Output layout is position-major: column p of segment s lives at
    ``p*nseg + s`` in the returned (n, w*nseg) block — the caller's
    srcpos map accounts for it."""
    return jax.jit(functools.partial(cluster_orth_narrow_body, w=w))


def cluster_orth_narrow_body(V, starts, widths, *, w: int):
    """Traceable body of `_compiled_cluster_orth_narrow` (see its doc)."""
    S, Gd = [], [[None] * w for _ in range(w)]
    for p in range(w):
        colp = jnp.clip(starts + p, 0, V.shape[1] - 1)
        m = (p < widths).astype(V.dtype)
        S.append(V[:, colp] * m[None, :])
    for i in range(w):
        for j in range(i + 1):
            g = jnp.sum(S[i] * S[j], axis=0)           # (nseg,)
            if i == j:                                  # identity pad
                g = jnp.where(i < widths, g, 1.0)
            Gd[i][j] = Gd[j][i] = g
    # Gershgorin acceptance (see cluster_orth_body): row sums of
    # |G - I| < 0.1 bounds cond(G), guaranteeing CholeskyQR reaches
    # ~n*u orthogonality in one pass.
    err = jnp.zeros_like(Gd[0][0])
    for i in range(w):
        row = sum(jnp.abs(Gd[i][j] - (1.0 if i == j else 0.0))
                  for j in range(w))
        err = jnp.maximum(err, row)
    L = [[None] * w for _ in range(w)]
    for i in range(w):
        for j in range(i + 1):
            acc = Gd[i][j]
            for k in range(j):
                acc = acc - L[i][k] * L[j][k]
            L[i][j] = jnp.sqrt(acc) if i == j else acc / L[j][j]
    Y = []
    for i in range(w):
        acc = S[i]
        for k in range(i):
            acc = acc - Y[k] * L[i][k][None, :]
        Y.append(acc / L[i][i][None, :])
    ok = err < 0.1
    for yi in Y:
        ok = ok & jnp.all(jnp.isfinite(yi), axis=0)
    return jnp.concatenate(Y, axis=1), ok


_NARROW_ORTH_W = 8


def plan_cluster_orth(lam_np, norm_t, gap_factor: float, C: int, n: int):
    """Host-side plan of a batched cluster orthonormalization from the
    eigenvalues ALONE (segments depend only on lam gaps, never on V) — so a
    caller that already holds lam on the host can bake the whole bucketed
    CholeskyQR into a single jit dispatch (`apply_cluster_orth_plan`)
    BEFORE any eigenvector work runs.

    Returns (sig, starts_list, widths_list, seg_of_col, srcpos, mask_plan,
    seg_ranges, wide_segs):
      sig          static tuple of (g2, w2, narrow, nseg) per bucket dispatch
      starts/widths  per-bucket (g2,) int64 numpy arrays
      seg_of_col   (C,) flat planned-segment index owning each column
      srcpos       (C,) column's replacement index inside the concatenated
                   bucket outputs (accounting for narrow position-major vs
                   wide segment-major layouts)
      mask_plan    (C,) True on planned columns
      seg_ranges   [(s, t)] per planned segment in flat order (for host
                   fallback on CholeskyQR rejection)
      wide_segs    [(s, t)] oversized segments (> _MAX_BATCH_W) the caller
                   must handle on the host."""
    lam_np = np.asarray(lam_np)
    segs = cluster_segments(lam_np, gap_factor * norm_t)
    small = [(s, t) for (s, t) in segs if t - s <= _MAX_BATCH_W]
    wide = [(s, t) for (s, t) in segs if t - s > _MAX_BATCH_W]
    buckets = {}
    for (s, t) in small:
        w2 = 1 << (t - s - 1).bit_length() if t - s > 1 else 1
        buckets.setdefault(max(w2, 2), []).append((s, t))
    budget_cols = max(_MIN_BUDGET_COLS, _BATCH_BUDGET_BYTES // (8 * n))
    sig, starts_l, widths_l, seg_ranges = [], [], [], []
    mask_plan = np.zeros(C, bool)
    srcpos = np.zeros(C, np.int64)
    seg_of_col = np.zeros(C, np.int64)
    off = 0
    segidx = 0
    for w2, segs_w in sorted(buckets.items()):
        gcap = max(1, budget_cols // w2)
        for o in range(0, len(segs_w), gcap):
            batch = segs_w[o:o + gcap]
            nseg = len(batch)
            g2 = 1 << (nseg - 1).bit_length() if nseg > 1 else 1
            narrow = w2 <= _NARROW_ORTH_W
            starts = np.zeros(g2, np.int64)
            widths = np.zeros(g2, np.int64)
            for i, (s, t) in enumerate(batch):
                starts[i] = s
                widths[i] = t - s
                mask_plan[s:t] = True
                seg_of_col[s:t] = segidx
                srcpos[s:t] = (off + np.arange(t - s) * g2 + i) if narrow \
                    else (off + i * w2 + np.arange(t - s))
                seg_ranges.append((s, t))
                segidx += 1
            sig.append((g2, w2, narrow, nseg))
            starts_l.append(starts)
            widths_l.append(widths)
            off += g2 * w2
    return (tuple(sig), starts_l, widths_l, seg_of_col, srcpos, mask_plan,
            seg_ranges, wide)


def apply_cluster_orth_plan(V, sig, starts_l, widths_l, seg_of_col, srcpos,
                            mask_plan):
    """Traceable: run every planned bucket's CholeskyQR and merge the
    accepted segments into V with ONE gather+select — acceptance (seg_ok)
    is resolved ON DEVICE, so the whole orthonormalization composes into a
    larger jit with zero host round-trips.  Returns (V, ok_cat) where
    ok_cat[i] tells the host whether planned segment i was accepted
    (rejected ones keep their input columns; the caller runs explicit QR)."""
    Yflats, oks = [], []
    for (g2, w2, narrow, nseg), st, wd in zip(sig, starts_l, widths_l):
        if narrow:
            Yf, ok = cluster_orth_narrow_body(V, st, wd, w=w2)
        else:
            Yf, ok = cluster_orth_body(V, st, wd, nseg=g2, wmax=w2)
        Yflats.append(Yf)
        oks.append(ok[:nseg])
    if not Yflats:
        return V, jnp.zeros((0,), bool)
    ok_cat = jnp.concatenate(oks) if len(oks) > 1 else oks[0]
    Ycat = jnp.concatenate(Yflats, axis=1) if len(Yflats) > 1 else Yflats[0]
    col_ok = mask_plan & ok_cat[seg_of_col]
    V = jnp.where(col_ok[None, :], Ycat[:, srcpos], V)
    return V, ok_cat


def orth_explicit_qr(V, segs):
    """Host fallback: explicit QR of the given (s, t) column ranges —
    near-parallel columns whose Gram was not safely SPD."""
    for s, t in segs:
        q, _ = jnp.linalg.qr(V[:, s:t])
        V = V.at[:, s:t].set(q)
    return V


@functools.lru_cache(maxsize=64)
def _compiled_orth_writeback(n: int, nparts: int):
    """ONE full-V merge of every orth bucket's compact output.

    ``Ys`` are the buckets' (n, g2*w2) blocks; ``srcpos[j]`` indexes column
    j's replacement inside their concatenation, ``mask[j]`` selects the
    accepted columns.  Single gather + select pass over V — the only
    full-width traffic of the whole orthonormalization."""

    def fn(V, Ys, mask, srcpos):
        Ycat = jnp.concatenate(Ys, axis=1) if len(Ys) > 1 else Ys[0]
        return jnp.where(mask[None, :], Ycat[:, srcpos], V)

    return jax.jit(fn, donate_argnums=(0, 1))


# Column-count threshold below which the merge writeback updates only the
# replaced segments instead of re-writing all of V: the full (n, C) f64
# gather+select pass cost ~0.12 s of the n=16384 headline's ortho_final to
# replace FOUR columns.  NEVER a scatter — a 2-D column scatter on these
# shapes busts the TPU's 16 MB scoped-VMEM limit (measured: f32[16384,16384]
# scatter wanted 17 MB) — the segments are contiguous (s, t) column ranges,
# so each is one static-offset dynamic_update_slice.
_NARROW_WRITEBACK_COLS = 128


@functools.lru_cache(maxsize=64)
def _compiled_orth_writeback_dus(n: int, seg_plan, nparts: int):
    """Per-segment dynamic_update_slice writeback for a SMALL set of
    accepted segments.  ``seg_plan`` is a static tuple of
    (start_col, srcpos_tuple) — everything about the copy is host-known,
    so the jit is pure slices + tiny lane gathers (no scatter)."""

    def fn(V, Ys):
        Ycat = jnp.concatenate(Ys, axis=1) if len(Ys) > 1 else Ys[0]
        for start, srcpos in seg_plan:
            upd = Ycat[:, jnp.asarray(np.asarray(srcpos, np.int64))]
            V = jax.lax.dynamic_update_slice(V, upd, (0, start))
        return V

    return jax.jit(fn, donate_argnums=(0,))


def orthonormalize_clusters(lam, V, norm_t, gap_factor: float = 1e-8,
                            min_gap_factor: float = 0.0,
                            touched=None, degenerate_below: float = 0.0):
    """Orthonormalize eigenvector groups whose eigenvalue gaps are below
    gap_factor * ||T|| (inverse iteration cannot separate them; any orthonormal
    basis of the cluster subspace has an equally small residual).

    Threshold analysis (with the default TWO refinement passes): initial
    f32-downsweep contamination is min(1, eps_f32*||T||/gap); each pass
    multiplies it by (lambda_err/gap ~ 10*eps*||T||/gap).  Two passes push all
    gaps above ~1e-8*||T|| to <=1e-11 orthogonality, so only genuinely
    (near-)degenerate groups below that need the orthonormalization.

    All segments up to width 256 are processed in ONE batched CholeskyQR
    dispatch (a host loop of per-segment QRs cost 2.6 s on the clustered
    n=4096 bench — ~64 sequential emulated-f64 QR dispatches); oversized
    segments (rare: a >256-fold degeneracy) fall back to explicit QR."""
    segs = cluster_segments(lam, gap_factor * norm_t)
    if (touched is not None or degenerate_below > 0.0) and segs:
        # final-cleanup filter: only segments that were NOT left orthonormal
        # by the mid-refinement pass need work — genuinely degenerate groups
        # (every gap below degenerate_below*||T||, which the mid pass skipped)
        # and segments containing a column the extra/rescue refinement passes
        # modified afterwards.  Everything else was CholeskyQR'd mid-pipeline
        # and has not changed since.
        import numpy as np
        lam_np = np.asarray(lam)
        thr_deg = degenerate_below * norm_t
        tch = None if touched is None else np.asarray(touched)

        def _needs(s, t):
            if degenerate_below > 0.0 and \
                    np.diff(lam_np[s:t]).max(initial=0.0) < thr_deg:
                return True
            return tch is not None and bool(tch[s:t].any())

        segs = [(s, t) for (s, t) in segs if _needs(s, t)]
    if min_gap_factor > 0.0 and segs:
        # keep only segments containing at least one gap ABOVE
        # min_gap_factor*||T||: fully-degenerate clusters (every gap below)
        # gain nothing from an early cleanup — refinement cannot separate
        # them anyway and the final pass gives them their orthonormal basis.
        # (The clustered-spectrum bench is entirely such segments; cleaning
        # them mid-refinement cost ~0.3 s for zero accuracy benefit.)
        import numpy as np
        lam_np = np.asarray(lam)
        thr = min_gap_factor * norm_t
        segs = [(s, t) for (s, t) in segs
                if np.diff(lam_np[s:t]).max(initial=0.0) >= thr]
    if not segs:
        return V

    import numpy as np
    small = [(s, t) for (s, t) in segs if t - s <= _MAX_BATCH_W]
    large = [(s, t) for (s, t) in segs if t - s > _MAX_BATCH_W]

    if small:
        n, C = int(V.shape[0]), int(V.shape[1])
        # Bucket segments by power-of-two padded width and cap each
        # dispatch's padded column count: the kernel's gather materializes
        # S (n, g2, w2) f64, so one flat pow2 grid over ALL segments
        # (g2 x w2 >= nseg x wmax) explodes when widths vary — at the
        # n=16384 random headline the wide risky-gap band yields ~1400
        # segments of widths 2..~32, an 8.6 GB gather that OOMs the 16 GB
        # chip next to the live V/Y/repl buffers.  Width buckets waste at
        # most 2x on padding; the per-dispatch budget keeps S <= ~0.5 GB.
        buckets = {}
        for (s, t) in small:
            w2 = 1 << (t - s - 1).bit_length() if t - s > 1 else 1
            buckets.setdefault(max(w2, 2), []).append((s, t))
        budget_cols = max(_MIN_BUDGET_COLS, _BATCH_BUDGET_BYTES // (8 * n))
        prof_ortho = os.environ.get("SE_PROFILE_ORTHO") == "1"
        t_prof = _time.perf_counter() if prof_ortho else 0.0
        # Phase 1: queue every bucket's compute-only CholeskyQR (async); keep
        # the compact outputs + host metadata.  No full-V traffic here.
        Yflats, seg_oks, metas = [], [], []
        off = 0
        for w2, segs_w in sorted(buckets.items()):
            gcap = max(1, budget_cols // w2)
            for o in range(0, len(segs_w), gcap):
                batch = segs_w[o:o + gcap]
                nseg = len(batch)
                g2 = 1 << (nseg - 1).bit_length() if nseg > 1 else 1
                starts = np.zeros(g2, np.int64)
                widths = np.zeros(g2, np.int64)
                for i, (s, t) in enumerate(batch):
                    starts[i] = s
                    widths[i] = t - s
                narrow = w2 <= _NARROW_ORTH_W
                kern = (_compiled_cluster_orth_narrow if narrow
                        else _compiled_cluster_orth)
                Yf, seg_ok = kern(n, g2, w2)(
                    V, jnp.asarray(starts), jnp.asarray(widths))
                if prof_ortho:
                    Yf.block_until_ready()
                    _ = np.asarray(seg_ok[:1])   # tunnel: force completion
                    print(f"    [ortho] bucket w2={w2} nseg={nseg} g2={g2}"
                          f" narrow={narrow}"
                          f" wall={_time.perf_counter()-t_prof:.3f}s",
                          flush=True)
                    t_prof = _time.perf_counter()
                Yflats.append(Yf)
                seg_oks.append(seg_ok[:nseg])
                metas.append((batch, off, w2, g2, narrow))
                off += g2 * w2
        # Phase 2: ONE seg_ok fetch for every dispatch (each np.asarray is a
        # ~33 ms tunnel round-trip; batching them was worth ~0.1 s/phase).
        ok_all = np.asarray(jnp.concatenate(seg_oks)) if seg_oks else \
            np.zeros(0, bool)
        if prof_ortho:
            print(f"    [ortho] seg_ok fetch ({len(metas)} dispatches)"
                  f" wall={_time.perf_counter()-t_prof:.3f}s", flush=True)
            t_prof = _time.perf_counter()
        # Phase 3: build the column->source map on host and merge everything
        # into V in one writeback.  CholeskyQR failures (non-SPD Gram:
        # columns the refinement could not separate) keep their inputs and
        # fall through to the explicit-QR path.
        mask = np.zeros(C, bool)
        srcpos = np.zeros(C, np.int64)
        k = 0
        acc_segs = []
        for batch, base, w2, g2, narrow in metas:
            for i, (s, t) in enumerate(batch):
                if ok_all[k]:
                    mask[s:t] = True
                    # narrow buckets emit position-major blocks (column p of
                    # segment i at p*g2 + i); wide ones segment-major
                    srcpos[s:t] = (base + np.arange(t - s) * g2 + i) \
                        if narrow else (base + i * w2 + np.arange(t - s))
                    acc_segs.append((s, tuple(int(v) for v in srcpos[s:t])))
                else:
                    large.append((s, t))
                k += 1
        nrep = int(mask.sum())
        if nrep and nrep <= _NARROW_WRITEBACK_COLS:
            V = _compiled_orth_writeback_dus(n, tuple(acc_segs),
                                             len(Yflats))(V, Yflats)
        elif nrep:
            V = _compiled_orth_writeback(n, len(Yflats))(
                V, Yflats, jnp.asarray(mask), jnp.asarray(srcpos))
        if prof_ortho:
            V.block_until_ready()
            _ = np.asarray(V[:1, :1])
            print(f"    [ortho] writeback wall="
                  f"{_time.perf_counter()-t_prof:.3f}s", flush=True)

    tpu_f64 = (jax.default_backend() == "tpu" and V.dtype == jnp.float64)
    for s, t in large:
        ok, Y = _compiled_wide_orth(int(V.shape[0]), t - s, tpu_f64)(V[:, s:t])
        if bool(ok):
            V = V.at[:, s:t].set(Y)
        else:
            # near-parallel columns the refinement could not separate:
            # CholeskyQR's Gram is not safely SPD, take the explicit QR
            q, _ = jnp.linalg.qr(V[:, s:t])
            V = V.at[:, s:t].set(q)
    return V
