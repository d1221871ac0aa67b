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

import jax
import jax.numpy as jnp
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


def inverse_iteration(d, e, lam, V, steps: int = 1):
    """Refine eigenvector columns by ``steps`` inverse-iteration passes.

    V may arrive in float32 (mixed-precision downsweep); the solves run in the
    dtype of (d, e).  Columns are re-normalized each step.
    """
    dtype = d.dtype
    X = V.astype(dtype)
    for _ in range(steps):
        X = solve_shifted_tridiagonal(d, e, lam, X)
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


def orthonormalize_clusters(lam, V, norm_t, gap_factor: float = 1e-8):
    """QR-orthonormalize eigenvector groups whose eigenvalue gaps are below
    gap_factor * ||T|| (inverse iteration cannot separate them; any orthonormal
    basis of the cluster subspace has an equally small residual).

    Threshold analysis (with the default TWO refinement passes): initial
    f32-downsweep contamination is min(1, eps_f32*||T||/gap); each pass
    multiplies it by (lambda_err/gap ~ 10*eps*||T||/gap).  Two passes push all
    gaps above ~1e-8*||T|| to <=1e-11 orthogonality, so only genuinely
    (near-)degenerate groups below that need QR.  Keeping the threshold tight
    matters: smooth spectra (Poisson) have thousands of gaps just above it and
    every extra segment costs host-loop dispatches (observed 68s vs 5s at
    n=16384 with a loose threshold)."""
    segs = cluster_segments(lam, gap_factor * norm_t)
    if not segs:
        return V
    for s, t in segs:
        q, _ = jnp.linalg.qr(V[:, s:t])
        V = V.at[:, s:t].set(q)
    return V
