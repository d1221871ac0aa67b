"""Batched leaf eigensolver.

Replaces the reference's per-rank LAPACK call
``LAPACKE_dsteqr(LAPACK_ROW_MAJOR,'I',nl,D,E,Q,nl)`` (main.c:460) — the only
LAPACK dependency of the reference — with one *batched* dense symmetric
eigendecomposition of all leaf blocks at once (``jnp.linalg.eigh`` on a
(P, b, b) stack, which XLA lowers to its TPU-native QDWH/Jacobi path; float64 is
emulated float32-pair arithmetic on TPU).  Pad slots carry large, well-separated
sentinel diagonal values so their eigenpairs are (sentinel, e_i) and sort last
within each leaf.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.tree import TreePlan


def leaf_blocks(d_torn, e, plan: TreePlan, sentinels):
    """Build the (P, b, b) dense symmetric tridiagonal leaf blocks.

    ``sentinels``: (padded_n,) diagonal values used at pad slots.
    In-leaf off-diagonals exclude the torn boundary entries (they became betas).
    """
    P, b, n = plan.num_leaves, plan.leaf_pad, plan.n
    rows = jnp.asarray(plan.row_map())
    diag = sentinels.at[rows].set(d_torn)
    diag = diag.reshape(P, b)

    if b > 1:
        # static gather of in-leaf off-diagonal entries
        off_idx = np.zeros((P, b - 1), dtype=np.int64)
        off_mask = np.zeros((P, b - 1), dtype=bool)
        for i, (off, sz) in enumerate(zip(plan.leaf_offsets, plan.leaf_sizes)):
            cnt = max(sz - 1, 0)
            off_idx[i, :cnt] = off + np.arange(cnt)
            off_mask[i, :cnt] = True
        eg = e[jnp.asarray(np.clip(off_idx, 0, max(n - 2, 0)))]
        eg = jnp.where(jnp.asarray(off_mask), eg, jnp.zeros_like(eg))
    else:
        eg = jnp.zeros((P, 0), dtype=d_torn.dtype)

    A = jnp.zeros((P, b, b), dtype=d_torn.dtype)
    ar = jnp.arange(b)
    A = A.at[:, ar, ar].set(diag)
    if b > 1:
        ar1 = jnp.arange(b - 1)
        A = A.at[:, ar1, ar1 + 1].set(eg)
        A = A.at[:, ar1 + 1, ar1].set(eg)
    return A


def eigh2x2(A):
    """Exact batched eigendecomposition of symmetric 2x2 blocks (..., 2, 2).

    Closed-form, cancellation-free (lam2 - a evaluated as c^2/(h+r)), built from
    elementwise ops only — this is the accurate TPU base case: XLA's own
    ``eigh`` on TPU yields ~1e-7 eigenvector residuals under emulated f64,
    while these formulas stay at working precision.  Returns ascending
    eigenvalues and an orthogonal Q with columns matching.
    """
    a = A[..., 0, 0]
    b = A[..., 1, 1]
    c = A[..., 0, 1]
    t = 0.5 * (a + b)
    h = 0.5 * (a - b)
    r = jnp.hypot(h, c)
    lam1 = t - r
    lam2 = t + r
    # eigenvector of lam2: (c, lam2 - a) or (lam2 - b, c), choosing the
    # cancellation-free branch via (r - h)(r + h) = c^2
    hp = jnp.abs(h) + r
    v2x_pos = jnp.ones_like(c)                 # h >= 0: (1, c/(h+r))
    v2y_pos = c / jnp.where(hp > 0, hp, 1.0)
    v2x_neg = c / jnp.where(hp > 0, hp, 1.0)   # h < 0: (c/(r-h), 1)
    v2y_neg = jnp.ones_like(c)
    pos = h >= 0
    v2x = jnp.where(pos, v2x_pos, v2x_neg)
    v2y = jnp.where(pos, v2y_pos, v2y_neg)
    nrm = jnp.hypot(v2x, v2y)
    v2x = v2x / nrm
    v2y = v2y / nrm
    # degenerate diagonal block (h == 0, c == 0): identity
    degen = r == 0
    v2x = jnp.where(degen, jnp.zeros_like(v2x), v2x)
    v2y = jnp.where(degen, jnp.ones_like(v2y), v2y)
    # v1 orthogonal to v2
    v1x = -v2y
    v1y = v2x
    lam = jnp.stack([lam1, lam2], axis=-1)
    Q = jnp.stack([jnp.stack([v1x, v2x], axis=-1),
                   jnp.stack([v1y, v2y], axis=-1)], axis=-2)
    return lam, Q


def eigh1x1(A):
    """Trivial base case: pure secular recursion to scalar leaves."""
    lam = A[..., 0, 0]
    return lam[..., None], jnp.ones_like(A)


def leaf_eigh_fn(leaf_pad: int):
    """Pick the batched leaf eigensolver for a given padded leaf size.

    b=1/2: exact closed forms.  b>2 on TPU: batched cyclic Jacobi
    (kernels/jacobi.py) — XLA's eigh only reaches ~1e-7 residuals under
    emulated f64 there.  Elsewhere (CPU/GPU): LAPACK-backed jnp.linalg.eigh.
    """
    if leaf_pad == 1:
        return eigh1x1
    if leaf_pad == 2:
        return eigh2x2
    try:
        import jax
        if jax.default_backend() == "tpu":
            from .jacobi import jacobi_eigh
            return jacobi_eigh
    except Exception:
        pass
    return jnp.linalg.eigh


def solve_leaves(d_torn, e, plan: TreePlan, sentinels, eigh_fn=None):
    """Eigendecompose all leaves; return (lam (P,b), Q (P,b,b), first/last rows).

    ``first``/``last`` are the first/last *actual* rows of each leaf's Q — the
    only parts of Q the conquer phase needs (ref main.c:472-474).
    ``eigh_fn`` lets the driver substitute a shard_mapped batched eigh.
    """
    A = leaf_blocks(d_torn, e, plan, sentinels)
    lam, Q = (eigh_fn or jnp.linalg.eigh)(A)
    first = Q[:, 0, :]
    last_rows = jnp.asarray(np.asarray(plan.leaf_sizes, dtype=np.int64) - 1)
    last = Q[jnp.arange(plan.num_leaves), last_rows, :]
    return lam, Q, first, last
