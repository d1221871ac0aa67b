"""Divide phase: rank-one tearing of T into the leaf blocks.

Reference: main.c:258-421.  There, log2(p) sequential MPI stages each pick a
splitter rank, choose theta by a sign/magnitude rule (main.c:365-394), modify two
diagonal entries, and MPI_Send the right half.  On TPU there is nothing to send —
"distribution" is sharding — and because we always pick ``theta = sign(beta)``
(so ``rho = beta * theta = |beta| >= 0``), the theta choice no longer depends on
previously-torn diagonal values, which makes the whole divide phase one
vectorized scatter over every split boundary of every level at once.

Design note vs the reference: the reference's magnitude rule (theta = 1000*beta
etc., main.c:383-388) guards against digit loss when ``d`` and ``beta`` have
opposite signs; subtraction of exact inputs is backward-stable regardless, and a
|theta| far from 1 skews ||z|| badly (z2 is scaled by 1/theta, helper.c:36-50),
so the TPU build deliberately keeps |theta| = 1.  With rho >= 0 the secular
solver needs only one branch of the interlacing logic (ref: eigenvalues.c:137-138
handles both signs).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from .tree import TreePlan


def tear(d, e, plan: TreePlan):
    """Modify D at every split boundary; return (d_torn, per-level betas/thetas).

    For each internal node with boundary row r (last actual row of its left
    subtree):  beta = E[r];  theta = sign(beta) (0 -> +1);
    D[r] -= theta*beta;  D[r+1] -= beta/theta.   (ref: main.c:391-394)
    """
    betas: List[jnp.ndarray] = []
    thetas: List[jnp.ndarray] = []
    if plan.num_levels == 0:
        return d, betas, thetas

    all_rows = np.concatenate([np.asarray(lv.boundary_rows, dtype=np.int64)
                               for lv in plan.levels])
    rows = jnp.asarray(all_rows)
    beta_all = e[rows]
    theta_all = jnp.where(beta_all < 0, -1.0, 1.0).astype(d.dtype)
    d = d.at[rows].add(-theta_all * beta_all)
    d = d.at[rows + 1].add(-beta_all / theta_all)

    off = 0
    for lv in plan.levels:
        k = lv.num_merges
        betas.append(beta_all[off:off + k])
        thetas.append(theta_all[off:off + k])
        off += k
    return d, betas, thetas
