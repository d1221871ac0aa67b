import jax
import jax.numpy as jnp
import numpy as np
import pytest

import symmetric_eigenvalue_tpu as se
from symmetric_eigenvalue_tpu.kernels.tridiagonalize import (apply_q,
                                                             tridiagonalize)


def reconstruct_q(Vt, tau):
    """Q = H_0 H_1 ... from reflector ROWS of Vt (transposed storage)."""
    n = Vt.shape[0]
    Q = np.eye(n)
    for k in range(n):
        v = np.asarray(Vt[k, :])
        Q = Q @ (np.eye(n) - float(tau[k]) * np.outer(v, v))
    return Q


@pytest.mark.parametrize("n,panel", [(5, 2), (16, 4), (33, 8), (64, 32),
                                     (50, 7)])
def test_tridiagonalize_reconstructs(n, panel, rng):
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    d, e, V, tau = jax.jit(
        lambda A: tridiagonalize(A, panel=panel))(jnp.asarray(A))
    d, e = np.asarray(d), np.asarray(e)
    T = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    Q = reconstruct_q(V, tau)
    nA = np.abs(A).max()
    assert np.abs(Q.T @ Q - np.eye(n)).max() < 1e-13
    assert np.abs(Q.T @ A @ Q - T).max() < 1e-12 * max(nA, 1)
    # eigenvalues preserved
    assert np.abs(np.linalg.eigvalsh(T) - np.linalg.eigvalsh(A)).max() \
        < 1e-12 * max(nA, 1)


def test_apply_q_matches_reconstruction(rng):
    n, panel = 40, 8
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    d, e, V, tau = jax.jit(
        lambda A: tridiagonalize(A, panel=panel))(jnp.asarray(A))
    Q = reconstruct_q(V, tau)
    X = rng.standard_normal((n, 6))
    QX = np.asarray(jax.jit(
        lambda V, tau, X: apply_q(V, tau, X, panel=panel))(
            V, tau, jnp.asarray(X)))
    assert np.abs(QX - Q @ X).max() < 1e-12
    QtX = np.asarray(jax.jit(
        lambda V, tau, X: apply_q(V, tau, X, panel=panel, transpose=True))(
            V, tau, jnp.asarray(X)))
    assert np.abs(QtX - Q.T @ X).max() < 1e-12


@pytest.mark.parametrize("n", [1, 2, 3, 48, 100])
def test_dense_eigh_end_to_end(n, rng):
    A = rng.standard_normal((n, n)) * 3
    A = (A + A.T) / 2
    lam, V = se.driver.eigh(A, config=se.SolverConfig(leaf_size=16))
    lam, V = np.asarray(lam), np.asarray(V)
    wref = np.linalg.eigvalsh(A)
    nA = max(np.abs(wref).max(), 1.0)
    assert np.abs(lam - wref).max() < 1e-12 * nA
    assert np.abs(A @ V - V * lam[None, :]).max() < 1e-11 * nA
    assert np.abs(V.T @ V - np.eye(n)).max() < 1e-11


def test_dense_eigh_already_tridiagonal(rng):
    n = 32
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    A = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    lam, V = se.driver.eigh(A, config=se.SolverConfig(leaf_size=8))
    wref = np.linalg.eigvalsh(A)
    assert np.abs(np.asarray(lam) - wref).max() < 1e-12 * max(1, np.abs(wref).max())


@pytest.mark.parametrize("n,panel,buckets", [(64, 8, 3), (100, 8, 4),
                                             (129, 16, 4), (33, 8, 2)])
def test_tridiagonalize_bucketed(n, panel, buckets, rng):
    """Trailing-submatrix bucketing (the n=16384 HBM-stream optimization)
    must be numerically identical to the single-pass reduction."""
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    d, e, Vt, tau = jax.jit(lambda A: tridiagonalize(
        A, panel=panel, buckets=buckets))(jnp.asarray(A))
    d, e = np.asarray(d), np.asarray(e)
    T = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    w0 = np.linalg.eigvalsh(A)
    assert np.abs(w0 - np.linalg.eigvalsh(T)).max() < 1e-12 * max(
        1, np.abs(w0).max())
    Q = np.asarray(apply_q(Vt, tau, jnp.eye(n, dtype=jnp.float64),
                           panel=panel))
    assert np.abs(A @ Q - Q @ T).max() < 1e-12
    assert np.abs(Q.T @ Q - np.eye(n)).max() < 1e-13


def test_dense_eigh_staged_route(rng):
    """Above single_jit_max_n, eigh runs front-end -> staged solve ->
    backtransform as separate dispatches (the n=16384 TPU path)."""
    n = 192
    A = rng.standard_normal((n, n)) * 2
    A = (A + A.T) / 2
    cfg = se.SolverConfig(leaf_size=16, single_jit_max_n=64)
    lam, V = se.driver.eigh(A, config=cfg)
    lam, V = np.asarray(lam), np.asarray(V)
    wref = np.linalg.eigvalsh(A)
    nA = max(np.abs(wref).max(), 1.0)
    assert np.abs(lam - wref).max() < 1e-12 * nA
    assert np.abs(A @ V - V * lam[None, :]).max() < 1e-11 * nA
    assert np.abs(V.T @ V - np.eye(n)).max() < 1e-11


def test_dense_eigh_caches_trace(rng):
    """Two same-shape eigh calls must reuse one traced/compiled function
    (the dense first compile is ~10 min on the tunneled TPU)."""
    from symmetric_eigenvalue_tpu.driver import _compiled_eigh
    _compiled_eigh.cache_clear()
    cfg = se.SolverConfig(leaf_size=8)
    A = rng.standard_normal((24, 24))
    A = A + A.T
    B = rng.standard_normal((24, 24))
    B = B + B.T
    lam_a, _ = se.driver.eigh(A, config=cfg)
    lam_b, _ = se.driver.eigh(B, config=cfg)
    info = _compiled_eigh.cache_info()
    assert info.misses == 1 and info.hits == 1
    assert np.allclose(np.asarray(lam_a), np.linalg.eigvalsh(A), atol=1e-10)
    assert np.allclose(np.asarray(lam_b), np.linalg.eigvalsh(B), atol=1e-10)
