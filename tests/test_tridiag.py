import numpy as np
import pytest

from symmetric_eigenvalue_tpu.core import tridiag as tt


def test_scheme1_structure():
    d, e = tt.create_matrix_scheme1(5)
    d, e = np.asarray(d), np.asarray(e)
    assert np.allclose(e, -1.0)
    assert d[0] == 1.0 and d[-1] == 100.0
    assert np.allclose(np.diff(d), (100.0 - 1.0) / 4)


def test_scheme2_structure():
    d, e = tt.create_matrix_scheme2(7)
    assert np.allclose(np.asarray(d), 2.0)
    assert np.allclose(np.asarray(e), -1.0)


def test_scheme2_analytic_spectrum_matches_lapack():
    n = 50
    d, e = tt.create_matrix_scheme2(n)
    T = tt.dense_from_tridiag(d, e)
    w = np.linalg.eigvalsh(T)
    assert np.allclose(w, tt.eigenvalues_of_scheme2(n), atol=1e-12)


def test_matvec_matches_dense(rng):
    n = 23
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    x = rng.standard_normal((n, 4))
    T = tt.dense_from_tridiag(d, e)
    y = np.asarray(tt.tridiag_matvec(d, e, x))
    assert np.allclose(y, T @ x, atol=1e-13)
    y1 = np.asarray(tt.tridiag_matvec(d, e, x[:, 0]))
    assert np.allclose(y1, T @ x[:, 0], atol=1e-13)


def test_norm_bound_dominates_spectrum(rng):
    n = 40
    d = rng.standard_normal(n) * 3
    e = rng.standard_normal(n - 1)
    T = tt.dense_from_tridiag(d, e)
    w = np.linalg.eigvalsh(T)
    assert float(tt.tridiag_norm_bound(d, e)) >= np.abs(w).max() - 1e-12


def test_residual_norms(rng):
    n = 16
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    T = tt.dense_from_tridiag(d, e)
    w, V = np.linalg.eigh(T)
    r = np.asarray(tt.residual_norms(d, e, w, V))
    assert r.max() < 1e-13
