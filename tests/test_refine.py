import jax
import jax.numpy as jnp
import numpy as np
import pytest

from symmetric_eigenvalue_tpu.core.tridiag import dense_from_tridiag
from symmetric_eigenvalue_tpu.kernels.refine import (cluster_segments,
                                                     inverse_iteration,
                                                     solve_shifted_tridiagonal)


def test_solve_shifted_matches_numpy(rng):
    n, K = 40, 7
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    lam = rng.standard_normal(K) * 2
    B = rng.standard_normal((n, K))
    X = np.asarray(jax.jit(solve_shifted_tridiagonal)(
        jnp.asarray(d), jnp.asarray(e), jnp.asarray(lam), jnp.asarray(B)))
    T = dense_from_tridiag(d, e)
    for i in range(K):
        x = np.linalg.solve(T - lam[i] * np.eye(n), B[:, i])
        assert np.abs(X[:, i] - x).max() < 1e-10 * max(1, np.abs(x).max())


def test_solve_near_singular_shift(rng):
    """Shifts essentially AT eigenvalues: the inverse-iteration regime."""
    n = 30
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    T = dense_from_tridiag(d, e)
    w, V = np.linalg.eigh(T)
    lam = w[:5] + 1e-14
    B = rng.standard_normal((n, 5))
    X = np.asarray(jax.jit(solve_shifted_tridiagonal)(
        jnp.asarray(d), jnp.asarray(e), jnp.asarray(lam), jnp.asarray(B)))
    assert np.isfinite(X).all()
    # solution should be dominated by the corresponding eigenvector
    for i in range(5):
        x = X[:, i] / np.linalg.norm(X[:, i])
        assert abs(abs(np.dot(x, V[:, i])) - 1.0) < 1e-6


def test_inverse_iteration_refines_f32_vectors(rng):
    n = 80
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    T = dense_from_tridiag(d, e)
    w, V = np.linalg.eigh(T)
    V32 = (V + 1e-6 * rng.standard_normal(V.shape)).astype(np.float32)
    X = np.asarray(jax.jit(inverse_iteration)(
        jnp.asarray(d), jnp.asarray(e), jnp.asarray(w), jnp.asarray(V32)))
    nT = np.abs(w).max()
    res = np.abs(T @ X - X * w[None, :]).max()
    assert res < 1e-12 * nT
    assert np.abs(X.T @ X - np.eye(n)).max() < 1e-10


def test_cluster_segments():
    lam = np.array([0.0, 1e-12, 2e-12, 1.0, 2.0, 2.0 + 1e-13])
    segs = cluster_segments(lam, 1e-9)
    assert segs == [(0, 3), (4, 6)]
    assert cluster_segments(np.array([0.0, 1.0]), 1e-9) == []


def test_cluster_orth_wide_segment(rng):
    """Segments wider than the batched-CholeskyQR cap (256) take the
    single-dispatch wide CholeskyQR path (e.g. the ~320-column Poisson edge
    runs once the orthogonalization band covers the full risky-gap band) —
    NOT the seconds-long explicit QR fallback.  Must orthonormalize in place
    (same subspace) and leave other columns untouched."""
    from symmetric_eigenvalue_tpu.kernels.refine import (_MAX_BATCH_W,
                                                         orthonormalize_clusters)

    n = 384
    w = _MAX_BATCH_W + 8
    lam = np.arange(n, dtype=float)
    lam[:w] = np.linspace(0.0, 1e-10, w)     # one wide near-degenerate run
    V = _orthonormal(rng, n, n)
    V[:, :w] += 1e-6 * rng.standard_normal((n, w))
    out = np.asarray(orthonormalize_clusters(
        lam, jnp.asarray(V), norm_t=float(np.abs(lam).max())))
    blk = out[:, :w]
    assert np.abs(blk.T @ blk - np.eye(w)).max() < 1e-12
    proj = blk @ (blk.T @ V[:, :w])
    assert np.abs(proj - V[:, :w]).max() < 1e-5
    assert np.array_equal(out[:, w:], V[:, w:])


def test_cluster_orth_wide_segment_rank_deficient(rng):
    """Wide segment whose Gram is singular (two identical columns): the
    Gershgorin guard rejects the CholeskyQR and the explicit-QR fallback
    still returns an orthonormal block."""
    from symmetric_eigenvalue_tpu.kernels.refine import (_MAX_BATCH_W,
                                                         orthonormalize_clusters)

    n = 320
    w = _MAX_BATCH_W + 4
    lam = np.arange(n, dtype=float)
    lam[:w] = 0.0
    V = _orthonormal(rng, n, n)
    V[:, 1] = V[:, 0]
    out = np.asarray(orthonormalize_clusters(
        lam, jnp.asarray(V), norm_t=float(np.abs(lam).max())))
    assert np.isfinite(out).all()
    blk = out[:, :w]
    assert np.abs(blk.T @ blk - np.eye(w)).max() < 1e-12


def test_cluster_orth_final_filter(rng):
    """ortho_final's segment filter: only genuinely degenerate segments
    (every gap below degenerate_below*||T||) and segments containing a
    'touched' column are processed; everything else — already CholeskyQR'd
    mid-pipeline and unchanged since — must pass through bit-identical."""
    from symmetric_eigenvalue_tpu.kernels.refine import orthonormalize_clusters

    n = 96
    norm_t = float(n)
    lam = np.arange(n, dtype=float)
    lam[10:13] = 10.0                          # degenerate (gaps 0)
    lam[40:43] = [40.0, 40.0 + 1e-5, 40.0 + 2e-5]   # separable, in-band
    lam[70:72] = [70.0, 70.0 + 1e-5]           # separable, in-band, touched
    V = _orthonormal(rng, n, n)
    for s, t in [(10, 13), (40, 43), (70, 72)]:
        V[:, s:t] += 1e-6 * rng.standard_normal((n, t - s))
    touched = np.zeros(n, dtype=bool)
    touched[71] = True
    out = np.asarray(orthonormalize_clusters(
        lam, jnp.asarray(V), norm_t=norm_t, gap_factor=1e-6,
        touched=touched, degenerate_below=1e-8))
    for s, t in [(10, 13), (70, 72)]:          # degenerate + touched: fixed
        blk = out[:, s:t]
        assert np.abs(blk.T @ blk - np.eye(t - s)).max() < 1e-12
    # untouched separable segment: bit-identical pass-through
    assert np.array_equal(out[:, 40:43], V[:, 40:43])


def test_blocked_solver_matches_dense(rng):
    """Spike-style partitioned solver vs dense oracle, incl. near-eigenvalue
    shifts (the inverse-iteration regime) and a non-multiple-of-nb size."""
    import numpy as np
    from symmetric_eigenvalue_tpu.kernels.refine import (
        solve_shifted_tridiagonal_blocked)

    for n, nb in [(300, 64), (517, 128)]:
        d = rng.standard_normal(n) * 2
        e = rng.standard_normal(n - 1)
        T = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
        w = np.linalg.eigvalsh(T)
        lam = np.concatenate([rng.standard_normal(4) * 2,
                              w[:2] + 1e-10, w[-2:] - 1e-13])
        B = rng.standard_normal((n, lam.shape[0]))
        X = np.asarray(jax.jit(
            lambda d, e, l, B: solve_shifted_tridiagonal_blocked(
                jnp.asarray(d), jnp.asarray(e), jnp.asarray(l),
                jnp.asarray(B), nb=nb))(d, e, lam, B))
        for i in range(lam.shape[0]):
            r = (T - lam[i] * np.eye(n)) @ X[:, i] - B[:, i]
            rel = np.abs(r).max() / max(np.abs(X[:, i]).max(), 1.0)
            assert rel < 1e-13, (n, nb, i, rel)


def _orthonormal(rng, n, k):
    q, _ = np.linalg.qr(rng.standard_normal((n, k)))
    return q


def test_cluster_orth_batched_accept(rng):
    """Near-orthonormal cluster columns (the common post-refinement case):
    the batched CholeskyQR's a-priori Gershgorin acceptance must take the
    fast path and return working-precision orthogonality."""
    from symmetric_eigenvalue_tpu.kernels.refine import orthonormalize_clusters

    n = 96
    lam = np.arange(n, dtype=float)
    lam[10:13] = 10.0          # one 3-fold cluster
    lam[40:42] = 40.0          # one 2-fold cluster
    V = _orthonormal(rng, n, n)
    # perturb the cluster columns by ~1e-6 (f32-downsweep-grade mixing)
    V[:, 10:13] += 1e-6 * rng.standard_normal((n, 3))
    V[:, 40:42] += 1e-6 * rng.standard_normal((n, 2))
    out = np.asarray(orthonormalize_clusters(
        lam, jnp.asarray(V), norm_t=float(np.abs(lam).max())))
    for s, t in [(10, 13), (40, 42)]:
        blk = out[:, s:t]
        assert np.abs(blk.T @ blk - np.eye(t - s)).max() < 1e-12
        # same subspace as the input cluster (CholeskyQR, not a replacement)
        proj = blk @ (blk.T @ V[:, s:t])
        assert np.abs(proj - V[:, s:t]).max() < 1e-5
    # non-cluster columns untouched
    mask = np.ones(n, bool)
    mask[10:13] = mask[40:42] = False
    assert np.array_equal(out[:, mask], V[:, mask])


def test_cluster_orth_rank_deficient_fallback(rng):
    """A cluster whose columns the refinement could NOT separate (two
    IDENTICAL columns -> singular Gram): the Gershgorin guard must reject the
    segment a-priori and the explicit-QR fallback must still return an
    orthonormal block."""
    from symmetric_eigenvalue_tpu.kernels.refine import orthonormalize_clusters

    n = 64
    lam = np.arange(n, dtype=float)
    lam[20:23] = 20.0
    V = _orthonormal(rng, n, n)
    V[:, 21] = V[:, 20]        # rank-deficient segment
    out = np.asarray(orthonormalize_clusters(
        lam, jnp.asarray(V), norm_t=float(np.abs(lam).max())))
    assert np.isfinite(out).all()
    blk = out[:, 20:23]
    assert np.abs(blk.T @ blk - np.eye(3)).max() < 1e-12


def test_compiled_residuals_matches_reference(rng):
    """The one-dispatch chunked residual pass (lax.map over column chunks,
    with tail padding) must match per-chunk residual_norms exactly, including
    a C that is not a chunk multiple."""
    from symmetric_eigenvalue_tpu.core.tridiag import residual_norms
    from symmetric_eigenvalue_tpu.driver import _compiled_residuals

    n, C, chunk = 48, 21, 8          # K=3 chunks, 3-column padded tail
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    lam = rng.standard_normal(C)
    V = rng.standard_normal((n, C))
    ref = np.asarray(residual_norms(jnp.asarray(d), jnp.asarray(e),
                                    jnp.asarray(lam), jnp.asarray(V)))
    got = np.asarray(_compiled_residuals(n, C, chunk)(
        jnp.asarray(d), jnp.asarray(e), jnp.asarray(lam), jnp.asarray(V)))
    np.testing.assert_allclose(got, ref, rtol=1e-13, atol=0.0)


def test_cluster_orth_width_buckets(rng, monkeypatch):
    """Mixed segment widths + a tiny per-dispatch budget: segments are
    bucketed by padded width and chunked across several batched dispatches
    (the flat pow2 grid over all segments OOM'd at n=16384 — 8.6 GB gather).
    Every segment must still come back orthonormal spanning its subspace."""
    import symmetric_eigenvalue_tpu.kernels.refine as refine

    monkeypatch.setattr(refine, "_BATCH_BUDGET_BYTES", 8 * 128 * 8)
    monkeypatch.setattr(refine, "_MIN_BUDGET_COLS", 8)

    n = 128
    lam = np.arange(n, dtype=float)
    segs = [(4, 6), (10, 12), (20, 24), (30, 33), (40, 46), (60, 62),
            (70, 82), (90, 92), (100, 104), (110, 112)]
    V = _orthonormal(rng, n, n)
    for s, t in segs:
        lam[s:t] = lam[s]
        V[:, s:t] += 1e-7 * rng.standard_normal((n, t - s))
    out = np.asarray(refine.orthonormalize_clusters(
        lam, jnp.asarray(V), norm_t=float(np.abs(lam).max())))
    for s, t in segs:
        blk = out[:, s:t]
        assert np.abs(blk.T @ blk - np.eye(t - s)).max() < 1e-12, (s, t)
        proj = blk @ (blk.T @ V[:, s:t])
        assert np.abs(proj - V[:, s:t]).max() < 1e-6, (s, t)
    # untouched columns pass through bit-identical
    mask = np.ones(n, dtype=bool)
    for s, t in segs:
        mask[s:t] = False
    assert np.array_equal(out[:, mask], V[:, mask])


def test_gram_reduce_matches_einsum(rng):
    """The fused-reduction Gram (TPU fast path for narrow segment buckets)
    must match the einsum Gram to f64 precision."""
    from symmetric_eigenvalue_tpu.kernels.refine import _gram_reduce

    S = rng.standard_normal((5, 300, 4))
    ref = np.einsum("bnw,bnv->bwv", S, S)
    got = np.asarray(_gram_reduce(jnp.asarray(S)))
    np.testing.assert_allclose(got, ref, rtol=1e-13, atol=1e-14)
