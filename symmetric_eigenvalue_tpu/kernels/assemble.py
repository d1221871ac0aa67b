"""Eigenvector assembly from a MergeRep: U reconstruction and row propagation.

Replaces the reference's ``getEigenVector`` / ``computeNormalizationFactors``
(eigenvalues.c:257-358) and the scalar first/last-row dot products of the conquer
loop (main.c:612-661).  Instead of extracting one eigenvector at a time, whole
column blocks of U are materialized from the compact MergeRep (an elementwise
Cauchy-like kernel) and consumed by batched MXU matmuls; U is *rematerialized* on
the downsweep rather than stored, trading cheap FLOPs for HBM.

Coordinate convention: ``U[j, i]`` with rows j = pole coordinates (original
concat-of-children order after ``p12`` inversion) and columns i = eigenvalues in
ascending order (via ``colperm``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .secular import MergeRep


def _denominators(rep: MergeRep, slots):
    """(m, C) matrix of d_j - lam_i = (d_j - d_shift_i) - tau_i, full accuracy."""
    shift = rep.shift_idx[slots]
    tauc = rep.tau[slots]
    return (rep.poles_sec[:, None] - rep.poles_sec[shift][None, :]) - tauc[None, :]


def _replay_rotations_rows(rep: MergeRep, u):
    """Apply the inverse Givens chain to rows of u (reverse log order; direct
    pattern) — ref eigenvalues.c:343-357.  Trip count is the *actual* number of
    rotations (lax.fori_loop with a traced bound), so cost scales with deflation.
    """

    def body(i, u):
        k = rep.nrot - 1 - i
        a = rep.rot_a[k]
        b = rep.rot_b[k]
        c = rep.rot_c[k]
        s = rep.rot_s[k]
        ua = u[a]
        ub = u[b]
        u = u.at[a].set(c * ua + s * ub)
        u = u.at[b].set(-s * ua + c * ub)
        return u

    return lax.fori_loop(0, rep.nrot, body, u)


def _replay_rotations_cols_t(rep: MergeRep, w):
    """Apply the transposed chain to columns of w (forward log order), used when
    computing  w @ R @ U_slot  without materializing U."""

    def body(k, w):
        a = rep.rot_a[k]
        b = rep.rot_b[k]
        c = rep.rot_c[k]
        s = rep.rot_s[k]
        wa = w[:, a]
        wb = w[:, b]
        w = w.at[:, a].set(c * wa - s * wb)
        w = w.at[:, b].set(s * wa + c * wb)
        return w

    return lax.fori_loop(0, rep.nrot, body, w)


def assemble_u(rep: MergeRep, cols: Optional[jnp.ndarray] = None):
    """Materialize U columns.  ``cols``: indices into the ascending eigenvalue
    order (None = all m columns).  Returns (m, C) with rows in original order.
    """
    m = rep.poles.shape[0]
    slots = rep.colperm if cols is None else rep.colperm[cols]
    act = slots < rep.K
    denom = _denominators(rep, slots)
    u = rep.zhat[:, None] / denom / rep.colnorm[slots][None, :]
    eye_cols = (jnp.arange(m, dtype=slots.dtype)[:, None] == slots[None, :])
    u = jnp.where(act[None, :], u, eye_cols.astype(u.dtype))
    u = _replay_rotations_rows(rep, u)
    inv_rows = jnp.argsort(rep.p12)
    return u[inv_rows]


def rows_through_merge(rep: MergeRep, w):
    """y = w @ (R U_slot) with output columns in ascending-eigenvalue order.

    ``w``: (r, m) rows in original coordinates.  Used on the upsweep to push the
    subtree's first/last boundary rows through a merge (the 'only two rows
    travel' trick of the reference, main.c:583-595) at O(r*m^2) cost without
    materializing U.
    """
    m = rep.poles.shape[0]
    wp = w[:, rep.p12]
    wp = _replay_rotations_cols_t(rep, wp)
    denom = _denominators(rep, jnp.arange(m, dtype=rep.colperm.dtype))
    M = rep.zhat[:, None] / denom                    # (j, i)
    y_act = (wp @ M) / rep.colnorm[None, :]
    active = (jnp.arange(m, dtype=rep.K.dtype) < rep.K)[None, :]
    y = jnp.where(active, y_act, wp)
    return y[:, rep.colperm]
