"""Tridiagonal matrix utilities: generators, mat-vec, residuals, oracles.

Reference parity:
  * scheme 1/2 generators  -> /root/reference/src/helper.c:7-33
  * analytic scheme-2 spectrum -> helper.c:52-62 (latent test oracle)
  * tridiagonal mat-vec residual -> filehandling.c:513-531
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def create_matrix_scheme1(n: int, dtype=jnp.float64):
    """Tridiagonal [-1, d_i, -1] with d_i evenly spaced in [1, 100].

    Ref: helper.c:7-20 (``createMatrixScheme1``).
    """
    if n == 1:
        return jnp.array([1.0], dtype=dtype), jnp.zeros((0,), dtype=dtype)
    spacing = (100.0 - 1.0) / (n - 1)
    d = 1.0 + spacing * jnp.arange(n, dtype=dtype)
    e = -jnp.ones((n - 1,), dtype=dtype)
    return d, e


def create_matrix_scheme2(n: int, dtype=jnp.float64):
    """Poisson matrix [-1, 2, -1].  Ref: helper.c:22-33."""
    d = 2.0 * jnp.ones((n,), dtype=dtype)
    e = -jnp.ones((max(n - 1, 0),), dtype=dtype)
    return d, e


def eigenvalues_of_scheme2(n: int, dtype=np.float64) -> np.ndarray:
    """Analytic spectrum of the Poisson matrix: 2 + 2 cos(pi*i/(n+1)), i=1..n.

    Ref: helper.c:52-62 (``computeEigenvaluesOfScheme2``).  Returned ascending.
    """
    i = np.arange(1, n + 1, dtype=dtype)
    lam = 2.0 + 2.0 * np.cos(np.pi * i / (n + 1))
    return np.sort(lam)


def tridiag_matvec(d, e, x):
    """y = T @ x for symmetric tridiagonal T = (d, e); x may be (n,) or (n, k).

    Ref: the residual mat-vec in filehandling.c:513-531.
    """
    d = jnp.asarray(d)
    e = jnp.asarray(e)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    y = d[:, None] * x
    if e.shape[0] > 0:
        y = y.at[:-1].add(e[:, None] * x[1:])
        y = y.at[1:].add(e[:, None] * x[:-1])
    return y[:, 0] if squeeze else y


def residual_norms(d, e, lam, vecs):
    """||T v_i - lam_i v_i||_2 per eigenpair (columns of ``vecs``).

    Ref: filehandling.c:513-531 writes this next to each eigenvalue.
    """
    r = tridiag_matvec(d, e, vecs) - lam[None, :] * vecs
    return jnp.linalg.norm(r, axis=0)


def tridiag_norm_bound(d, e):
    """Cheap upper bound on ||T||_2 (Gershgorin / inf-norm)."""
    d = jnp.asarray(d)
    e = jnp.asarray(e)
    n = d.shape[0]
    if n == 1:
        return jnp.abs(d[0])
    ea = jnp.abs(e)
    row = jnp.abs(d)
    row = row.at[:-1].add(ea)
    row = row.at[1:].add(ea)
    return jnp.max(row)


def dense_from_tridiag(d, e) -> np.ndarray:
    """Dense numpy matrix from (d, e) — test oracle helper."""
    d = np.asarray(d)
    e = np.asarray(e)
    T = np.diag(d)
    if e.shape[0] > 0:
        T += np.diag(e, 1) + np.diag(e, -1)
    return T
