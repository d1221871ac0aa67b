"""Blocked Householder tridiagonalization: dense symmetric -> (d, e, reflectors).

The reference solves tridiagonal inputs only; BASELINE.md's north star adds a
dense front-end so symmetric inputs run end-to-end.  This is a LAPACK
``sytrd``/``latrd``-style panel algorithm recast for the TPU memory system:

  * every per-column access is **major-dim**: the current column of the
    symmetric A is read as the row ``A[j, :]`` (dynamic_slice of contiguous
    memory), and the reflector/update accumulators are stored *transposed* —
    reflector k is ROW k of ``Vt`` — so the per-column writes are contiguous
    ``dynamic_update_slice`` row stores.  (The previous layout's
    ``A[:, j]`` gathers and ``V.at[:, j].set`` scatters cost ~22 ms/column on
    TPU — minor-dim dynamic indexing of a 134 MB array; row form is ~100x.)
  * the inner panel loop does matvecs against delayed-update accumulators
    Vp/Wp, and each panel ends with one symmetric rank-2k trailing update
    (two big GEMMs on the MXU).

Eigenvector backtransformation applies the reflectors in compact-WY form
(``larft``/``larfb`` equivalents) — all GEMMs, no per-reflector passes.

Everything uses static shapes: the panel loop indexes with dynamic slices into
fixed buffers whose not-yet-filled rows are zero, so delayed updates are plain
full-width matvecs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _use_dword_matvec(n: int, dtype) -> bool:
    """True when the Pallas double-word kernels should carry the per-column
    ``v @ A`` product and the panel GEMMs (TPU + f64).

    XLA's emulated-f64 matvec costs ~10 ms at n=4096 (it materializes
    full-size f32-pair temporaries) and its emulated GEMM runs at
    ~0.1 TFLOP/s; the Pallas kernels stream A once (~0.25 ms) and run the
    GEMMs on the MXU via exact bf16 slicing (kernels/pallas/dword_matmul).
    Padding in :func:`tridiagonalize` makes any n tileable, so this only
    declines on non-TPU backends or non-f64 dtypes.
    """
    if dtype != jnp.float64:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing never raises today
        return False


def _mm(A, B, use_dword: bool, tm: int = 256, tn: int = 256):
    """f64-grade matmul: MXU-sliced Pallas kernel on TPU, jnp.dot elsewhere."""
    if not use_dword:
        return A @ B
    from .pallas.dword_matmul import dword_matmul
    return dword_matmul(A, B, tm=tm, tn=tn)


def _householder(x, j, n):
    """Householder vector zeroing x[j+2:], pivot at j+1; entries <= j masked.

    Returns (v (n,), tau, alpha) with H = I - tau v v^T, H x = (..., alpha, 0...),
    v normalized so v[j+1] = 1 (LAPACK convention).
    """
    idx = jnp.arange(n)
    tail = idx >= j + 1          # entries participating in the reflector
    below = idx >= j + 2         # entries to annihilate
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


def _tridiagonalize_block(As, ncols: int, nb: int, use_dword: bool):
    """Run the blocked-Householder reduction over the FIRST ``ncols`` columns
    of the trailing symmetric submatrix ``As`` (m, m).

    Returns (As_updated, Vtb (ncols, m) reflector rows in LOCAL coordinates,
    taus (ncols,), evec (ncols,)).  Reflector for local column j has zeros at
    entries <= j and unit at j+1, exactly the full-matrix convention shifted.
    """
    m = As.shape[0]
    dtype = As.dtype
    num_panels = (ncols + nb - 1) // nb
    if use_dword:
        from .pallas.dword_matvec import dword_vecmat

    # pad ncols to whole panels (masked no-op columns)
    Vtb = jnp.zeros((num_panels * nb, m), dtype)
    taus = jnp.zeros((num_panels * nb,), dtype)
    evec = jnp.zeros((num_panels * nb,), dtype)

    def panel_body(p, carry):
        As, Vtb, taus, evec = carry
        o = p * nb
        Vp = jnp.zeros((nb, m), dtype)   # panel reflectors, rows
        Wp = jnp.zeros((nb, m), dtype)   # panel W accumulators, rows
        if use_dword:
            from .pallas.cauchy_matmul import split_f64
            # split once per panel; As is constant through the inner loop
            # (delayed updates), so the pair stays exact all panel long
            Ah, Al = split_f64(As)

        def col_body(jj, inner):
            As, Vp, Wp, Vtb, taus, evec = inner
            j = o + jj
            live = (j < m - 1) & (j < ncols)
            # delayed update of column j (= row j: As and its updates stay
            # symmetric):  a = (As - Vp^T Wp - Wp^T Vp)[j, :]
            aj = lax.dynamic_slice(As, (j, 0), (1, m))[0]
            vcol = lax.dynamic_slice(Vp, (0, j), (nb, 1))[:, 0]   # Vp[:, j]
            wcol = lax.dynamic_slice(Wp, (0, j), (nb, 1))[:, 0]   # Wp[:, j]
            a = aj - wcol @ Vp - vcol @ Wp
            v, tau, alpha = _householder(a, j, m)
            v = jnp.where(live, v, jnp.zeros_like(v))
            tau = jnp.where(live, tau, 0.0)
            # w = tau * (A_updated v), delayed; As v = v As (symmetry)
            vA = dword_vecmat(v, Ah, Al) if use_dword else v @ As
            Av = vA - (Wp @ v) @ Vp - (Vp @ v) @ Wp
            w = tau * Av
            w = w - (0.5 * tau * jnp.dot(w, v)) * v
            Vp = lax.dynamic_update_slice(Vp, v[None, :], (jj, 0))
            Wp = lax.dynamic_update_slice(Wp, w[None, :], (jj, 0))
            Vtb = lax.dynamic_update_slice(Vtb, v[None, :], (j, 0))
            taus = taus.at[j].set(tau)
            evec = evec.at[j].set(jnp.where(live, alpha, evec[j]))
            return As, Vp, Wp, Vtb, taus, evec

        As, Vp, Wp, Vtb, taus, evec = lax.fori_loop(
            0, nb, col_body, (As, Vp, Wp, Vtb, taus, evec))
        # trailing symmetric rank-2k update, fused: As -= [V;W]^T [W;V]
        As = As - _mm(jnp.concatenate([Vp, Wp], axis=0).T,
                      jnp.concatenate([Wp, Vp], axis=0), use_dword)
        return As, Vtb, taus, evec

    As, Vtb, taus, evec = lax.fori_loop(
        0, num_panels, panel_body, (As, Vtb, taus, evec))
    return As, Vtb[:ncols], taus[:ncols], evec[:ncols]


def tridiagonalize(A, panel: int = 32, buckets: int = 1):
    """A (n, n) symmetric -> (d (n,), e (n-1,), Vt (n, n), tau (n,)).

    T = Q^T A Q with Q = H_0 H_1 ... H_{n-3};  H_k = I - tau_k v_k v_k^T where
    v_k = Vt[k, :] (reflectors stored as ROWS; zero at entries <= k, unit at
    entry k+1).

    ``buckets``: split the column range into equal chunks, each processed on
    a STATICALLY shrunk trailing submatrix A[c0:, c0:].  The per-column
    ``v @ A`` matvec streams only the trailing block, so total HBM traffic
    drops from n^3 reads toward the n^3/3 optimum (~0.4 n^3 at 8 buckets) —
    the dominant cost at n=16384 where the full pair stream is ~2.7 ms per
    column.  buckets=1 reproduces the round-2 single-pass behavior.
    """
    n = A.shape[0]
    dtype = A.dtype
    if n == 1:
        return (jnp.diagonal(A), jnp.zeros((0,), dtype),
                jnp.zeros((n, n), dtype), jnp.zeros((n,), dtype))
    nb = max(1, min(panel, n))
    use_dword = _use_dword_matvec(n, dtype)

    buckets = max(1, min(int(buckets), (n - 1 + nb - 1) // nb))
    # bucket cuts on panel boundaries covering columns [0, n-1)
    width = -((n - 1) // -buckets)            # ceil
    width = -((width) // -nb) * nb            # round up to whole panels
    cuts = [0]
    while cuts[-1] + width < n - 1:
        cuts.append(cuts[-1] + width)
    cuts.append(n - 1)

    d = jnp.zeros((n,), dtype)
    evec = jnp.zeros((n,), dtype)
    Vt = jnp.zeros((n, n), dtype)
    taus = jnp.zeros((n,), dtype)

    As = A
    for c0, c1 in zip(cuts[:-1], cuts[1:]):
        m = n - c0
        mp = m
        if use_dword:
            # pad so the double-word kernels tile evenly; reflectors are zero
            # in pad entries so results restricted to the first m rows/cols
            # are numerically identical
            pad = (-m) % 512
            if pad:
                As = jnp.pad(As, ((0, pad), (0, pad)))
                mp = m + pad
        ncols = c1 - c0
        As, Vtb, tb, eb = _tridiagonalize_block(As, ncols, nb, use_dword)
        Vt = lax.dynamic_update_slice(Vt, Vtb[:, :m], (c0, c0))
        taus = lax.dynamic_update_slice(taus, tb, (c0,))
        evec = lax.dynamic_update_slice(evec, eb, (c0,))
        d = lax.dynamic_update_slice(d, jnp.diagonal(As)[:ncols], (c0,))
        As = As[ncols:m, ncols:m]             # static shrink to next bucket

    # last (n - cuts[-1]) columns are inside the final 1x1/2x2 tail
    d = lax.dynamic_update_slice(d, jnp.diagonal(As), (cuts[-1],))
    e = evec[: n - 1]
    return d, e, Vt, taus


def _larft(Vp, tau, use_dword: bool = False):
    """Forward compact-WY T factor: Q = I - V T V^T for one panel.

    Vp (nb, n): reflectors as rows with unit structure already baked in;
    T upper triangular (nb, nb):
    T[:k, k] = -tau_k T[:k, :k] (V^T v_k), T[k, k] = tau_k.
    """
    nb = Vp.shape[0]
    G = _mm(Vp, Vp.T, use_dword, tm=32, tn=32)   # (nb, nb) gram
    def body(k, T):
        col = -tau[k] * (T @ G[:, k])
        col = jnp.where(jnp.arange(nb) < k, col, 0.0)
        col = col.at[k].set(tau[k])
        return T.at[:, k].set(col)
    return lax.fori_loop(0, nb, body, jnp.zeros((nb, nb), Vp.dtype))


def apply_q(Vt, taus, X, panel: int = 32, transpose: bool = False):
    """Apply Q (or Q^T) to X (n, k) in compact-WY blocks.

    Q = H_0 H_1 ... with H_j from row j of Vt;  Q @ X applies panels in
    reverse order, Q^T @ X forward.  Used for eigenvector backtransformation:
    A = Q T Q^T, so dense eigenvectors are Q @ (tridiagonal eigenvectors).
    """
    n = Vt.shape[0]
    nb = max(1, min(panel, n))
    num_panels = (n - 1 + nb - 1) // nb
    use_dword = _use_dword_matvec(n, Vt.dtype)
    # pad to whole panels: lax.dynamic_slice clamps out-of-bounds starts, which
    # would silently re-read earlier rows for a ragged last panel; padded
    # rows have tau = 0 (identity reflectors)
    pad_rows = num_panels * nb - n
    if pad_rows > 0:
        Vt = jnp.pad(Vt, ((0, pad_rows), (0, 0)))
        taus = jnp.pad(taus, (0, pad_rows))

    def apply_panel(p, X):
        o = p * nb
        Vp = lax.dynamic_slice(Vt, (o, 0), (nb, n))
        t = lax.dynamic_slice(taus, (o,), (nb,))
        T = _larft(Vp, t, use_dword)
        M = T.T if transpose else T
        # X <- (I - V M V^T) X; the outer products carry the O(n^2 nb) work
        return X - _mm(Vp.T, M @ _mm(Vp, X, use_dword, tm=32), use_dword)

    if transpose:
        X = lax.fori_loop(0, num_panels, apply_panel, X)
    else:
        X = lax.fori_loop(0, num_panels,
                          lambda i, X: apply_panel(num_panels - 1 - i, X), X)
    return X
