"""eigh_banded: scipy.linalg.eig_banded-parity surface over the band ->
tridiagonal chase (kernels/band_reduce.py) + Cuppen D&C.

The reference has no banded input path (src/main.c reads tridiagonal MTX
only); this is BASELINE.md completeness surface (LAPACK dsbevd tier), so the
oracle is scipy, not the reference.
"""

import numpy as np
import pytest
import scipy.linalg

from symmetric_eigenvalue_tpu import eigh_banded


def _random_band(rng, n, u, lower):
    """(u+1, n) band storage + the dense symmetric matrix it represents."""
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    # zero outside the band
    i, j = np.indices((n, n))
    A[np.abs(i - j) > u] = 0.0
    ab = np.zeros((u + 1, n))
    if lower:
        for k in range(u + 1):
            ab[k, : n - k] = np.diagonal(A, -k)
    else:
        for k in range(u + 1):
            ab[u - k, k:] = np.diagonal(A, k)
    return ab, A


@pytest.mark.parametrize("lower", [False, True])
@pytest.mark.parametrize("n,u", [(48, 0), (48, 1), (48, 2), (64, 5), (33, 7)])
def test_matches_scipy(rng, n, u, lower):
    ab, A = _random_band(rng, n, u, lower)
    lam_ref = scipy.linalg.eig_banded(ab, lower=lower, eigvals_only=True)
    lam, V = eigh_banded(ab, lower=lower)
    lam = np.asarray(lam)
    V = np.asarray(V)
    scale = max(np.abs(lam_ref).max(), 1.0)
    assert np.abs(lam - lam_ref).max() < 1e-12 * scale
    # eigenvectors: residual + orthogonality (signs/cluster bases differ
    # from scipy's, so compare against the matrix, not against scipy's V)
    R = A @ V - V * lam[None, :]
    assert np.abs(R).max() < 1e-12 * scale
    G = V.T @ V - np.eye(n)
    assert np.abs(G).max() < 1e-12


def test_eigvals_only(rng):
    ab, _ = _random_band(rng, 40, 3, False)
    lam_ref = scipy.linalg.eig_banded(ab, eigvals_only=True)
    lam = np.asarray(eigh_banded(ab, eigvals_only=True))
    assert np.abs(lam - lam_ref).max() < 1e-12 * max(np.abs(lam_ref).max(), 1)


def test_bandwidth_larger_than_matrix(rng):
    # u >= n: every entry is in-band; degenerate chase windows must not break
    n, u = 6, 8
    ab = np.zeros((u + 1, n))
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    for k in range(n):
        ab[u - k, k:] = np.diagonal(A, k)
    lam_ref = np.linalg.eigvalsh(A)
    lam, V = eigh_banded(ab)
    assert np.abs(np.asarray(lam) - lam_ref).max() < 1e-12 * max(
        np.abs(lam_ref).max(), 1.0)
    R = A @ np.asarray(V) - np.asarray(V) * np.asarray(lam)[None, :]
    assert np.abs(R).max() < 1e-12


def test_input_validation():
    with pytest.raises(ValueError):
        eigh_banded(np.zeros((3,)))
    with pytest.raises(ValueError):
        eigh_banded(np.zeros((2, 0)))


def test_dense_two_stage_staged_route(rng):
    """eigh(band=) above the single-jit limit: staged front-end jit +
    staged tridiagonal solve + blocked Q2/Q1 backtransform stages."""
    from symmetric_eigenvalue_tpu import SolverConfig, eigh

    n = 160
    A = rng.standard_normal((n, n))
    A = (A + A.T) / (2 * np.sqrt(n))
    cfg = SolverConfig(single_jit_max_n=64)       # force the staged route
    lam, V = eigh(A, config=cfg, band=16)
    lam, V = np.asarray(lam), np.asarray(V)
    assert np.abs(A @ V - V * lam[None, :]).max() < 1e-12
    assert np.abs(V.T @ V - np.eye(n)).max() < 1e-11
    assert np.abs(lam - np.linalg.eigvalsh(A)).max() < 1e-12


def test_tiny_n3_full_bandwidth(rng):
    """n=3, u=2: the (2,0) entry must actually be eliminated (regression —
    the wave chase's small-n guard once skipped the n=3 single task)."""
    A = np.array([[2., 1., 5.], [1., 3., 1.], [5., 1., 4.]])
    ab = np.zeros((3, 3))
    for k in range(3):
        ab[2 - k, k:] = np.diagonal(A, k)
    lam, V = eigh_banded(ab)
    lam, V = np.asarray(lam), np.asarray(V)
    assert np.abs(lam - np.linalg.eigvalsh(A)).max() < 1e-13
    assert np.abs(A @ V - V * lam[None, :]).max() < 1e-13
