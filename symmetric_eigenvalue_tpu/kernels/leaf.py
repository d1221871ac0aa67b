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
