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


def test_risky_column_selection():
    """Adaptive second-pass selection: only columns whose gaps the f32
    downsweep cannot resolve are marked (both sides of a tight gap)."""
    from symmetric_eigenvalue_tpu import SolverConfig
    from symmetric_eigenvalue_tpu.driver import risky_columns

    cfg = SolverConfig()
    u32 = np.finfo(np.float32).eps / 2.0
    norm_t = 10.0
    thr = cfg.refine_risky_gap_factor * u32 * norm_t
    # gaps: [wide, tight, wide, tight] -> columns 1,2 and 3,4 risky
    lam = np.array([0.0, 1.0, 1.0 + 0.1 * thr, 5.0, 5.0 + 0.5 * thr])
    risky = risky_columns(lam, norm_t, cfg)
    assert risky.tolist() == [False, True, True, True, True]
    # all-wide spectrum: nothing risky
    lam2 = np.arange(6, dtype=float)
    assert not risky_columns(lam2, norm_t, cfg).any()
    # threshold scales with config factor
    cfg2 = SolverConfig(refine_risky_gap_factor=1e9)
    assert risky_columns(lam2, norm_t, cfg2).all()


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
