"""Pallas Spike-solver kernels (interpret mode) vs the XLA blocked solver.

The kernel implements the SAME decomposition and pivoting as
refine.solve_shifted_tridiagonal_blocked, so outputs should agree to pair
roundoff (~2^-46 relative to solution scale) — plus true-residual checks
against the system itself.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from symmetric_eigenvalue_tpu.kernels import refine
from symmetric_eigenvalue_tpu.kernels.pallas.spike_solve import (
    solve_shifted_tridiagonal_spike, spike_refine)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _system(rng, n, K, near_singular=False):
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1) * 0.5
    if near_singular:
        # shifts at actual eigenvalues: the inverse-iteration regime
        T = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
        w = np.linalg.eigvalsh(T)
        lam = w[rng.choice(n, K, replace=False)]
    else:
        lam = np.sort(rng.standard_normal(K)) * 2.0
    B = rng.standard_normal((n, K))
    B /= np.linalg.norm(B, axis=0, keepdims=True)
    return (jnp.asarray(d), jnp.asarray(e), jnp.asarray(lam),
            jnp.asarray(B))


def _residual(d, e, lam, B, X):
    d, e, lam, B, X = (np.asarray(a, np.float64) for a in (d, e, lam, B, X))
    T = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    R = T @ X - X * lam[None, :] - B
    return np.max(np.abs(R)) / max(np.max(np.abs(X)), 1.0)


@pytest.mark.parametrize("n,K,nb", [(700, 16, 128), (1024, 40, 128),
                                    (500, 8, 96)])
def test_matches_blocked_solver(rng, n, K, nb):
    d, e, lam, B = _system(rng, n, K)
    X = solve_shifted_tridiagonal_spike(d, e, lam, B, nb=nb, interpret=True)
    assert X.shape == (n, K)
    assert _residual(d, e, lam, B, X) < 1e-12
    Xr = refine.solve_shifted_tridiagonal_blocked(d, e, lam, B, nb=nb)
    scale = np.max(np.abs(np.asarray(Xr)))
    assert np.max(np.abs(np.asarray(X) - np.asarray(Xr))) / scale < 1e-11


def test_near_singular_shifts(rng):
    """Shifts at eigenvalues: solutions blow up toward the eigenvector —
    the inverse-iteration regime with clamped pivots.  Compare the
    NORMALIZED outputs (directions) against the XLA path."""
    n, K = 640, 8
    d, e, lam, B = _system(rng, n, K, near_singular=True)
    X, res = spike_refine(d, e, lam, B, nb=128, interpret=True)
    X = np.asarray(X)
    # each normalized column is an eigenvector: tiny residual vs T
    d_, e_, lam_ = np.asarray(d), np.asarray(e), np.asarray(lam)
    T = np.diag(d_) + np.diag(e_, 1) + np.diag(e_, -1)
    R = T @ X - X * lam_[None, :]
    col_res = np.linalg.norm(R, axis=0)
    normT = np.max(np.abs(lam_))
    assert np.max(col_res) < 1e-11 * normT
    # the free residual estimate matches the measured one
    res = np.asarray(res)
    assert np.all(np.abs(res - col_res) <= 1e-2 * np.maximum(col_res, 1e-18)
                  + 1e-15 * normT)
    # columns are unit-norm
    assert np.max(np.abs(np.linalg.norm(X, axis=0) - 1.0)) < 1e-12


def test_column_padding(rng):
    """K not a multiple of the 1024-column tile: pad columns are dropped."""
    n, K = 512, 40
    d, e, lam, B = _system(rng, n, K)
    X = solve_shifted_tridiagonal_spike(d, e, lam, B, nb=128, interpret=True)
    assert X.shape == (n, K)
    assert _residual(d, e, lam, B, X) < 1e-12


def test_row_padding(rng):
    """n not a multiple of nb: decoupled pad rows don't disturb the slice."""
    n, K = 333, 8
    d, e, lam, B = _system(rng, n, K)
    X = solve_shifted_tridiagonal_spike(d, e, lam, B, nb=128, interpret=True)
    assert _residual(d, e, lam, B, X) < 1e-12


def test_chunked_matches_single(rng):
    """Multi-chunk processing (with a partial last chunk) must equal the
    single-chunk result exactly: same kernels, same per-chunk shapes."""
    from symmetric_eigenvalue_tpu.kernels.pallas.spike_solve import (
        spike_refine)
    n, K = 256, 2500
    d, e, lam, B = _system(rng, n, K)
    X1, r1 = spike_refine(d, e, lam, B, nb=128, chunk=4096, interpret=True)
    X2, r2 = spike_refine(d, e, lam, B, nb=128, chunk=1024, interpret=True)
    np.testing.assert_allclose(np.asarray(X1), np.asarray(X2),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                               rtol=1e-10, atol=0)


def test_scan_chunks_match_unrolled(rng):
    """The lax.scan chunk loop (the n=32768 anti-fragmentation route,
    driver._compiled_spike_refine) must equal the unrolled loop exactly —
    same kernels, same per-chunk shapes, including a padded last chunk."""
    from symmetric_eigenvalue_tpu.kernels.pallas.spike_solve import (
        spike_refine)
    n, K = 256, 2500
    d, e, lam, B = _system(rng, n, K)
    X1, r1 = spike_refine(d, e, lam, B, nb=128, chunk=1024, interpret=True)
    X2, r2 = spike_refine(d, e, lam, B, nb=128, chunk=1024, interpret=True,
                          scan=True)
    np.testing.assert_allclose(np.asarray(X1), np.asarray(X2),
                               rtol=0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                               rtol=1e-12, atol=0)


def test_clip_flags_residual_estimate(rng, monkeypatch):
    """When the back-substitution cascade hits the +-_BIG clip the output is
    not a solution and the free ||v||/||x|| estimate is meaningless (it came
    out ~1e-25 on the 4 garbled columns of the n=16384 headline) — the kernel
    must flag such columns with the 1e30 sentinel so the driver's rescue
    machinery sees them.  _BIG is lowered so ordinary inverse-iteration
    growth trips the clip; unique (n, nb) keep the jit cache fresh."""
    from symmetric_eigenvalue_tpu.kernels.pallas import spike_solve
    monkeypatch.setattr(spike_solve, "_BIG", 1e4)
    n, K, nb = 384, 6, 48
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1) * 0.5
    T = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    w, Q = np.linalg.eigh(T)
    idx = np.linspace(10, n - 10, K).astype(int)
    lam = w[idx]                    # shifts AT eigenvalues: growth ~1/eps
    B = Q[:, idx] + rng.standard_normal((n, K)) * 1e-8
    B /= np.linalg.norm(B, axis=0, keepdims=True)
    X, res = spike_solve.spike_refine(
        jnp.asarray(d), jnp.asarray(e), jnp.asarray(lam), jnp.asarray(B),
        nb=nb, interpret=True)
    res = np.asarray(res)
    # growth from a converged start is ~1/(eps*gap) >> 1e4: every column
    # must clip and be flagged
    assert np.all(res >= 1e29), res
    # and the flagged outputs are still finite unit vectors
    X = np.asarray(X)
    assert np.all(np.isfinite(X))
    np.testing.assert_allclose(np.linalg.norm(X, axis=0), 1.0, atol=1e-9)
