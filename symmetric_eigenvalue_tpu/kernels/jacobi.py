"""Batched parallel Jacobi eigensolver for small symmetric blocks.

The TPU-native replacement for LAPACK ``dsteqr`` at leaf sizes > 2
(ref main.c:460): XLA's own ``eigh`` yields only ~1e-7 eigenvector residuals
under TPU's emulated f64, while Jacobi rotations are built from elementwise
ops that stay at working precision (~2^-48).

Rotation schedule: a sequential scan over all b(b-1)/2 pivot pairs is
latency-bound on TPU (496 steps x ~0.1 ms at b=32 -> ~300 ms per leaf
stage).  Instead the pairs follow the classic **round-robin tournament**
ordering: each of the b-1 rounds holds b/2 index-disjoint rotations, so a
whole round applies to all P blocks at once as a handful of batched
gathers/scatters — b-1 wave steps per sweep instead of b(b-1)/2.
Convergence is still quadratic (cyclic-by-rounds order is a valid cyclic
Jacobi ordering); the sweep loop exits when every block's off-diagonal mass
is negligible.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _round_robin_pairs(b: int) -> np.ndarray:
    """(b-1, 2, b/2) int32: disjoint pivot pairs (i<j) per tournament round."""
    players = list(range(b))
    rounds = []
    for _ in range(b - 1):
        pairs = sorted(tuple(sorted((players[i], players[b - 1 - i])))
                       for i in range(b // 2))
        rounds.append(np.array(pairs, dtype=np.int32).T)   # (2, b/2)
        players = [players[0], players[-1]] + players[1:-1]
    return np.stack(rounds)


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
    if b % 2:                      # odd leaf sizes: pad with a decoupled row
        A = jnp.pad(A, ((0, 0), (0, 1), (0, 1)))
        # Gershgorin row-sum bound: every true eigenvalue satisfies
        # |lam| <= max_i sum_j |A_ij|, so the decoupled pad eigenvalue set
        # just above it always sorts last (max|A| alone is NOT a spectral
        # bound — an all-ones b=9 block has lam_max = 9 > 4*1+4's margin
        # logic only by luck; row sums are a guarantee)
        big = jnp.max(jnp.sum(jnp.abs(A), axis=2), axis=1)
        A = A.at[:, b, b].set(big * (1.0 + 1e-3) + 1.0)
        lam, V = jacobi_eigh(A, max_sweeps, tol_factor)
        return lam[:, :b], V[:, :b, :b]

    rounds_np = _round_robin_pairs(b)                    # (b-1, 2, b/2)
    pri = jnp.asarray(rounds_np[:, 0, :])
    prj = jnp.asarray(rounds_np[:, 1, :])

    fro = jnp.sqrt(jnp.sum(A * A, axis=(1, 2)))
    tol = tol_factor * jnp.maximum(fro, 1e-30)          # (P,)

    offmask = (1.0 - jnp.eye(b, dtype=dtype))[None]

    def offdiag_sq(A):
        # direct masked sum: total-minus-diagonal would cancel to rounding
        # noise (~eps*||A||_F^2) and fake convergence at off ~ sqrt(eps)
        return jnp.sum(A * A * offmask, axis=(1, 2))

    def round_step(r, state):
        A, V = state
        ii = pri[r]                                      # (b/2,) disjoint
        jj = prj[r]
        app = A[:, ii, ii]                               # (P, b/2)
        aqq = A[:, jj, jj]
        apq = A[:, ii, jj]
        # classic stable rotation: t = sign(theta)/(|theta| + sqrt(theta^2+1))
        # skip negligible pivots: they contribute < tol to the residual, and a
        # denormal apq would overflow theta^2 past the f32 exponent range of
        # TPU-emulated f64 (overflow renormalizes to NaN there, not inf)
        do = jnp.abs(apq) > tol[:, None] * (0.1 / (b * b))
        theta = (aqq - app) / (2.0 * jnp.where(do, apq, 1.0))
        theta = jnp.clip(theta, -1e15, 1e15)
        t = jnp.sign(theta) / (jnp.abs(theta) + jnp.sqrt(theta * theta + 1.0))
        t = jnp.where(theta == 0, jnp.ones_like(t), t)   # sign(0)=0 guard
        c = 1.0 / jnp.sqrt(t * t + 1.0)
        s = t * c
        c = jnp.where(do, c, jnp.ones_like(c))
        s = jnp.where(do, s, jnp.zeros_like(s))
        # A <- G^T A G: all b/2 rotations of the round touch disjoint
        # rows/columns, so they apply as one batched gather/rotate/scatter
        cb = c[:, :, None]                               # (P, b/2, 1)
        sb = s[:, :, None]
        row_i = A[:, ii, :]                              # (P, b/2, b)
        row_j = A[:, jj, :]
        A = A.at[:, ii, :].set(cb * row_i - sb * row_j)
        A = A.at[:, jj, :].set(sb * row_i + cb * row_j)
        col_i = A[:, :, ii]                              # (P, b, b/2)
        col_j = A[:, :, jj]
        cc = c[:, None, :]
        sc = s[:, None, :]
        A = A.at[:, :, ii].set(cc * col_i - sc * col_j)
        A = A.at[:, :, jj].set(sc * col_i + cc * col_j)
        # exact annihilation of the pivot elements
        A = A.at[:, ii, jj].set(jnp.zeros_like(apq))
        A = A.at[:, jj, ii].set(jnp.zeros_like(apq))
        v_i = V[:, :, ii]
        v_j = V[:, :, jj]
        V = V.at[:, :, ii].set(cc * v_i - sc * v_j)
        V = V.at[:, :, jj].set(sc * v_i + cc * v_j)
        return A, V

    def sweep(state):
        A, V, it = state
        A, V = lax.fori_loop(0, b - 1, round_step, (A, V))
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
