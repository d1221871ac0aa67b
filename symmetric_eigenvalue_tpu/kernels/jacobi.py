"""Batched cyclic Jacobi eigensolver for small symmetric blocks.

The TPU-native replacement for LAPACK ``dsteqr`` at leaf sizes > 2
(ref main.c:460): XLA's own ``eigh`` yields only ~1e-7 eigenvector residuals
under TPU's emulated f64, while Jacobi rotations are built from elementwise
ops that stay at working precision (~2^-48).  One (P, b, b) stack is swept in
lock-step: every rotation step updates two rows/columns of *all* P blocks at
once (batch-wide dynamic-update-slices, VPU-friendly), and the sweep loop
exits when every block's off-diagonal mass is negligible.

Cost: O(sweeps * b^2) steps of O(P*b) work; for b<=32 this is a few ms and
removes log2(b) merge levels from the tree.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def jacobi_eigh(A, max_sweeps: int = 30, tol_factor: float = 1e-14):
    """Eigendecomposition of a (P, b, b) stack of symmetric matrices.

    Returns (lam (P, b) ascending, V (P, b, b)) with V columns the
    eigenvectors.  ``tol_factor`` scales the per-block Frobenius norm for the
    sweep-convergence test.
    """
    P, b, _ = A.shape
    dtype = A.dtype
    if b == 1:
        return A[..., 0], jnp.ones_like(A)

    pairs = np.array([(i, j) for i in range(b - 1) for j in range(i + 1, b)],
                     dtype=np.int32)
    pi = jnp.asarray(pairs[:, 0])
    pj = jnp.asarray(pairs[:, 1])

    fro = jnp.sqrt(jnp.sum(A * A, axis=(1, 2)))
    tol = tol_factor * jnp.maximum(fro, 1e-30)          # (P,)

    offmask = (1.0 - jnp.eye(b, dtype=dtype))[None]

    def offdiag_sq(A):
        # direct masked sum: total-minus-diagonal would cancel to rounding
        # noise (~eps*||A||_F^2) and fake convergence at off ~ sqrt(eps)
        return jnp.sum(A * A * offmask, axis=(1, 2))

    def rotate(state, p):
        A, V = state
        i = pi[p]
        j = pj[p]
        app = A[:, i, i]
        aqq = A[:, j, j]
        apq = A[:, i, j]
        # classic stable rotation: t = sign(theta)/(|theta| + sqrt(theta^2+1))
        # skip negligible pivots: they contribute < tol to the residual, and a
        # denormal apq would overflow theta^2 past the f32 exponent range of
        # TPU-emulated f64 (overflow renormalizes to NaN there, not inf)
        do = jnp.abs(apq) > tol * (0.1 / (b * b))
        theta = (aqq - app) / (2.0 * jnp.where(do, apq, 1.0))
        theta = jnp.clip(theta, -1e15, 1e15)
        t = jnp.sign(theta) / (jnp.abs(theta) + jnp.sqrt(theta * theta + 1.0))
        t = jnp.where(theta == 0, jnp.ones_like(t), t)   # sign(0)=0 guard
        c = 1.0 / jnp.sqrt(t * t + 1.0)
        s = t * c
        c = jnp.where(do, c, jnp.ones_like(c))
        s = jnp.where(do, s, jnp.zeros_like(s))
        # A <- G^T A G ; G rotates columns (i, j)
        cb = c[:, None]
        sb = s[:, None]
        row_i = A[:, i, :]
        row_j = A[:, j, :]
        A = A.at[:, i, :].set(cb * row_i - sb * row_j)
        A = A.at[:, j, :].set(sb * row_i + cb * row_j)
        col_i = A[:, :, i]
        col_j = A[:, :, j]
        A = A.at[:, :, i].set(cb * col_i - sb * col_j)
        A = A.at[:, :, j].set(sb * col_i + cb * col_j)
        # exact annihilation of the (i, j) element
        A = A.at[:, i, j].set(jnp.zeros_like(apq))
        A = A.at[:, j, i].set(jnp.zeros_like(apq))
        v_i = V[:, :, i]
        v_j = V[:, :, j]
        V = V.at[:, :, i].set(cb * v_i - sb * v_j)
        V = V.at[:, :, j].set(sb * v_i + cb * v_j)
        return (A, V), None

    def sweep(state):
        A, V, it = state
        (A, V), _ = lax.scan(rotate, (A, V), jnp.arange(pairs.shape[0],
                                                        dtype=jnp.int32))
        return A, V, it + 1

    def cond(state):
        A, V, it = state
        return (it < max_sweeps) & jnp.any(offdiag_sq(A) > tol * tol)

    V0 = jnp.broadcast_to(jnp.eye(b, dtype=dtype), (P, b, b))
    A, V, _ = lax.while_loop(cond, sweep, (A, V0, jnp.int32(0)))

    lam = A[:, jnp.arange(b), jnp.arange(b)]
    order = jnp.argsort(lam, axis=1)
    lam = jnp.take_along_axis(lam, order, axis=1)
    V = jnp.take_along_axis(V, order[:, None, :], axis=2)
    return lam, V
