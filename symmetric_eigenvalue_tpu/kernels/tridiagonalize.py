"""Blocked Householder tridiagonalization: dense symmetric -> (d, e, reflectors).

The reference solves tridiagonal inputs only; BASELINE.md's north star adds a
dense front-end so symmetric inputs run end-to-end.  This is a LAPACK
``sytrd``/``latrd``-style panel algorithm recast for the MXU: the inner panel
loop does matvecs against delayed-update accumulators V/W, and each panel ends
with one symmetric rank-2k trailing update (two big GEMMs).  Eigenvector
backtransformation applies the reflectors in compact-WY form (``larft``/
``larfb`` equivalents) — all GEMMs, no per-reflector passes over the matrix.

Everything uses static shapes: the panel loop indexes with dynamic slices into
fixed (n, nb) buffers whose not-yet-filled columns are zero, so delayed updates
are plain full-width matvecs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _householder(x, j, n):
    """Householder vector zeroing x[j+2:], pivot at j+1; rows <= j masked out.

    Returns (v (n,), tau, alpha) with H = I - tau v v^T, H x = (..., alpha, 0...),
    v normalized so v[j+1] = 1 (LAPACK convention).
    """
    idx = jnp.arange(n)
    tail = idx >= j + 1          # rows participating in the reflector
    below = idx >= j + 2         # rows to annihilate
    x0 = jnp.where(tail, x, 0.0)
    pivot = x[j + 1]
    sigma2 = jnp.sum(jnp.where(below, x0 * x0, 0.0))
    norm = jnp.sqrt(pivot * pivot + sigma2)
    alpha = jnp.where(pivot >= 0, -norm, norm)   # sign avoids cancellation
    denom = pivot - alpha
    no_op = sigma2 == 0.0        # already tridiagonal in this column
    denom_safe = jnp.where(no_op, 1.0, denom)
    v = jnp.where(below, x0 / denom_safe, 0.0)
    v = v.at[j + 1].set(jnp.where(no_op, 0.0, 1.0))
    tau = jnp.where(no_op, 0.0, (alpha - pivot) / alpha)
    alpha = jnp.where(no_op, pivot, alpha)
    return v, tau, alpha


def tridiagonalize(A, panel: int = 32):
    """A (n, n) symmetric -> (d (n,), e (n-1,), V (n, n), tau (n,)).

    T = Q^T A Q with Q = H_0 H_1 ... H_{n-3};  H_k = I - tau_k v_k v_k^T where
    v_k = V[:, k] (zero above row k+1, unit at row k+1).
    """
    n = A.shape[0]
    dtype = A.dtype
    if n == 1:
        return jnp.diagonal(A), jnp.zeros((0,), dtype), jnp.zeros((n, n), dtype), jnp.zeros((n,), dtype)
    nb = max(1, min(panel, n))
    num_panels = (n - 1 + nb - 1) // nb

    Vall = jnp.zeros((n, n), dtype)
    taus = jnp.zeros((n,), dtype)
    evec = jnp.zeros((n,), dtype)    # e[j] at slot j

    def panel_body(p, carry):
        A, Vall, taus, evec = carry
        o = p * nb
        V = jnp.zeros((n, nb), dtype)
        W = jnp.zeros((n, nb), dtype)

        def col_body(jj, inner):
            A, V, W, Vall, taus, evec = inner
            j = o + jj
            live = j < n - 1       # columns beyond n-2 are no-ops
            # delayed update of column j:  a = (A - V W^T - W V^T)[:, j]
            a = A[:, j] - V @ W[j, :] - W @ V[j, :]
            v, tau, alpha = _householder(a, j, n)
            v = jnp.where(live, v, jnp.zeros_like(v))
            tau = jnp.where(live, tau, 0.0)
            # w = tau * (A_updated v) with delayed update, then make symmetric
            Av = A @ v - V @ (W.T @ v) - W @ (V.T @ v)
            w = tau * Av
            w = w - (0.5 * tau * jnp.dot(w, v)) * v
            V = V.at[:, jj].set(v)
            W = W.at[:, jj].set(w)
            Vall = Vall.at[:, j].set(v)
            taus = taus.at[j].set(tau)
            evec = evec.at[j].set(jnp.where(live, alpha, evec[j]))
            return A, V, W, Vall, taus, evec

        A, V, W, Vall, taus, evec = lax.fori_loop(
            0, nb, col_body, (A, V, W, Vall, taus, evec))
        # trailing symmetric rank-2k update: A <- A - V W^T - W V^T
        A = A - V @ W.T - W @ V.T
        return A, Vall, taus, evec

    A, Vall, taus, evec = lax.fori_loop(
        0, num_panels, panel_body, (A, Vall, taus, evec))

    d = jnp.diagonal(A)
    e = evec[: n - 1]
    return d, e, Vall, taus


def _larft(V, tau):
    """Forward compact-WY T factor: Q = I - V T V^T for one panel.

    V (n, nb) with unit 'diagonal' structure already baked in; T upper
    triangular (nb, nb):  T[:k, k] = -tau_k T[:k, :k] (V^T v_k), T[k, k] = tau_k.
    """
    nb = V.shape[1]
    G = V.T @ V                           # (nb, nb) gram
    def body(k, T):
        col = -tau[k] * (T @ G[:, k])
        col = jnp.where(jnp.arange(nb) < k, col, 0.0)
        col = col.at[k].set(tau[k])
        return T.at[:, k].set(col)
    return lax.fori_loop(0, nb, body, jnp.zeros((nb, nb), V.dtype))


def apply_q(Vall, taus, X, panel: int = 32, transpose: bool = False):
    """Apply Q (or Q^T) to X (n, k) in compact-WY blocks.

    Q = H_0 H_1 ... ;  Q @ X applies panels in reverse order, Q^T @ X forward.
    Used for eigenvector backtransformation: A = Q T Q^T, so dense eigenvectors
    are Q @ (tridiagonal eigenvectors).
    """
    n = Vall.shape[0]
    nb = max(1, min(panel, n))
    num_panels = (n - 1 + nb - 1) // nb
    # pad to whole panels: lax.dynamic_slice clamps out-of-bounds starts, which
    # would silently re-read earlier columns for a ragged last panel; padded
    # columns have tau = 0 (identity reflectors)
    pad_cols = num_panels * nb - n
    if pad_cols > 0:
        Vall = jnp.pad(Vall, ((0, 0), (0, pad_cols)))
        taus = jnp.pad(taus, (0, pad_cols))

    def apply_panel(p, X):
        o = p * nb
        V = lax.dynamic_slice(Vall, (0, o), (n, nb))
        t = lax.dynamic_slice(taus, (o,), (nb,))
        T = _larft(V, t)
        if transpose:
            M = T.T
        else:
            M = T
        # X <- (I - V M V^T) X
        return X - V @ (M @ (V.T @ X))

    if transpose:
        X = lax.fori_loop(0, num_panels, apply_panel, X)
    else:
        X = lax.fori_loop(0, num_panels,
                          lambda i, X: apply_panel(num_panels - 1 - i, X), X)
    return X
