import jax
import jax.numpy as jnp
import numpy as np
import pytest

from symmetric_eigenvalue_tpu.kernels.leaf import eigh1x1, eigh2x2, leaf_eigh_fn


def test_eigh2x2_random(rng):
    A = rng.standard_normal((64, 2, 2))
    A = A + A.transpose(0, 2, 1)
    lam, Q = jax.jit(eigh2x2)(jnp.asarray(A))
    lam, Q = np.asarray(lam), np.asarray(Q)
    for i in range(64):
        w = np.linalg.eigvalsh(A[i])
        assert np.abs(lam[i] - w).max() < 1e-14 * max(1, np.abs(w).max())
        res = np.abs(A[i] @ Q[i] - Q[i] * lam[i][None, :]).max()
        assert res < 1e-14 * max(1, np.abs(w).max())
        assert np.abs(Q[i].T @ Q[i] - np.eye(2)).max() < 1e-14
    assert np.all(lam[:, 0] <= lam[:, 1])


def test_eigh2x2_special_cases():
    cases = np.array([
        [[1.0, 0.0], [0.0, 1.0]],      # degenerate diagonal
        [[2.0, 0.0], [0.0, -3.0]],     # diagonal a > b
        [[-3.0, 0.0], [0.0, 2.0]],     # diagonal a < b
        [[1.0, 1e-12], [1e-12, 1.0]],  # near-degenerate with tiny coupling
        [[1.0, 5.0], [5.0, 1.0]],      # dominated by coupling
        [[0.0, 0.0], [0.0, 0.0]],      # zero block
    ])
    lam, Q = jax.jit(eigh2x2)(jnp.asarray(cases))
    lam, Q = np.asarray(lam), np.asarray(Q)
    for i, A in enumerate(cases):
        w = np.linalg.eigvalsh(A)
        assert np.abs(lam[i] - w).max() < 1e-14 * max(1, np.abs(w).max())
        res = np.abs(A @ Q[i] - Q[i] * lam[i][None, :]).max()
        assert res < 1e-13
        assert np.abs(Q[i].T @ Q[i] - np.eye(2)).max() < 1e-14


def test_eigh1x1():
    A = jnp.asarray(np.array([[[3.5]], [[-1.0]]]))
    lam, Q = eigh1x1(A)
    assert np.allclose(np.asarray(lam), [[3.5], [-1.0]])
    assert np.allclose(np.asarray(Q), 1.0)


def test_leaf_eigh_dispatch():
    assert leaf_eigh_fn(1) is eigh1x1
    assert leaf_eigh_fn(2) is eigh2x2
    assert leaf_eigh_fn(16) is jnp.linalg.eigh


def test_jacobi_eigh_matches_lapack(rng):
    from symmetric_eigenvalue_tpu.kernels.jacobi import jacobi_eigh

    A = rng.standard_normal((32, 24, 24))
    A = A + A.transpose(0, 2, 1)
    lam, V = jax.jit(jacobi_eigh)(jnp.asarray(A))
    lam, V = np.asarray(lam), np.asarray(V)
    for i in range(32):
        w = np.linalg.eigvalsh(A[i])
        nA = max(np.abs(w).max(), 1)
        assert np.abs(lam[i] - w).max() < 1e-12 * nA
        assert np.abs(A[i] @ V[i] - V[i] * lam[i][None, :]).max() < 1e-12 * nA
        assert np.abs(V[i].T @ V[i] - np.eye(24)).max() < 1e-12
    assert np.all(np.diff(lam, axis=1) >= -1e-12)


def test_jacobi_diagonal_and_degenerate():
    from symmetric_eigenvalue_tpu.kernels.jacobi import jacobi_eigh

    A = np.zeros((3, 8, 8))
    A[0] = np.eye(8) * 3
    A[1] = np.diag(np.arange(8.0))
    A[2] = np.eye(8) * 2
    A[2, 0, 1] = A[2, 1, 0] = 1e-14
    lam, V = jax.jit(jacobi_eigh)(jnp.asarray(A))
    for i in range(3):
        w = np.linalg.eigvalsh(A[i])
        assert np.abs(np.asarray(lam[i]) - w).max() < 1e-13
        assert np.abs(np.asarray(V[i]).T @ np.asarray(V[i]) - np.eye(8)).max() < 1e-13
