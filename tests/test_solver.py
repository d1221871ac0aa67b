"""End-to-end solver tests against dense LAPACK oracles and analytic spectra.

Mirrors the reference's verification model (SURVEY.md §4): residual self-checks
against the original T (filehandling.c:511-537) and the latent scheme-2
analytic-spectrum oracle (helper.c:52-62), plus orthogonality which the
reference never checked.
"""

import numpy as np
import pytest

import symmetric_eigenvalue_tpu as se
from symmetric_eigenvalue_tpu.core.tridiag import dense_from_tridiag


def full_check(d, e, cfg, tol=1e-12):
    n = len(d)
    lam, V = se.eigh_tridiagonal(d, e, config=cfg)
    lam, V = np.asarray(lam), np.asarray(V)
    T = dense_from_tridiag(d, e)
    wref = np.linalg.eigvalsh(T)
    nT = max(np.abs(wref).max(), 1.0)
    assert np.all(np.diff(lam) >= -1e-12 * nT), "ascending order"
    assert np.abs(lam - wref).max() <= tol * nT
    assert np.abs(T @ V - V * lam[None, :]).max() <= tol * nT
    assert np.abs(V.T @ V - np.eye(n)).max() <= 1e-12
    return lam, V


@pytest.mark.parametrize("n,leaf", [(1, 32), (2, 32), (3, 1), (8, 2), (16, 4),
                                    (37, 4), (64, 16), (100, 8), (200, 32)])
def test_random_matrices(n, leaf, rng):
    d = rng.standard_normal(n) * 5
    e = rng.standard_normal(max(n - 1, 0)) * 2
    full_check(d, e, se.SolverConfig(leaf_size=leaf))


def test_scheme2_analytic_spectrum():
    n = 128
    d, e = se.create_matrix_scheme2(n)
    lam = np.asarray(se.eigh_tridiagonal(np.asarray(d), np.asarray(e),
                                         config=se.SolverConfig(leaf_size=16),
                                         eigvals_only=True))
    assert np.abs(lam - se.eigenvalues_of_scheme2(n)).max() < 1e-12


def test_scheme1(rng):
    d, e = se.create_matrix_scheme1(100)
    full_check(np.asarray(d), np.asarray(e), se.SolverConfig(leaf_size=16))


def test_glued_wilkinson():
    k = 10
    m = 2 * k + 1
    dw = np.abs(np.arange(m) - k).astype(float)
    ew = np.ones(m - 1)
    copies = 4
    D = np.concatenate([dw] * copies)
    E = np.concatenate(sum([[ew, [1e-8]] for _ in range(copies - 1)], []) + [ew])
    full_check(D, E, se.SolverConfig(leaf_size=16), tol=1e-12)


def test_near_diagonal(rng):
    n = 96
    full_check(5.0 * np.ones(n), 1e-13 * (1 + rng.random(n - 1)),
               se.SolverConfig(leaf_size=16))


def test_geometric_scale(rng):
    n = 80
    d = np.geomspace(1e-8, 1e8, n)
    e = 0.1 * np.geomspace(1e-8, 1e7, n - 1)
    full_check(d, e, se.SolverConfig(leaf_size=16))


def test_zero_offdiagonals(rng):
    n = 64
    e = rng.standard_normal(n - 1)
    e[15] = 0.0
    e[31] = 0.0
    full_check(rng.standard_normal(n), e, se.SolverConfig(leaf_size=8))


def test_eigvals_only(rng):
    n = 50
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    lam = se.eigh_tridiagonal(d, e, eigvals_only=True,
                              config=se.SolverConfig(leaf_size=8))
    wref = np.linalg.eigvalsh(dense_from_tridiag(d, e))
    assert np.abs(np.asarray(lam) - wref).max() < 1e-12


def test_selected_eigenvectors(rng):
    n = 60
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    sel = [0, 7, 33, 59]
    res = se.solve_tridiagonal(d, e, select=sel,
                               config=se.SolverConfig(leaf_size=8))
    T = dense_from_tridiag(d, e)
    wref, Vref = np.linalg.eigh(T)
    lam = np.asarray(res.eigenvalues)
    V = np.asarray(res.eigenvectors)
    assert V.shape == (n, len(sel))
    for j, idx in enumerate(sel):
        r = np.abs(T @ V[:, j] - lam[idx] * V[:, j]).max()
        assert r < 1e-12 * max(np.abs(wref).max(), 1)


def test_residuals_helper(rng):
    n = 40
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    res = se.solve_tridiagonal(d, e, compute_vectors=True,
                               config=se.SolverConfig(leaf_size=8))
    r = np.asarray(se.residuals(d, e, res))
    assert r.shape == (n,)
    assert r.max() < 1e-12


def test_staged_solver_matches(rng):
    from symmetric_eigenvalue_tpu.driver import solve_tridiagonal_staged
    n = 48
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    cfg = se.SolverConfig(leaf_size=8)
    res1 = se.solve_tridiagonal(d, e, compute_vectors=True, config=cfg)
    res2, timer = solve_tridiagonal_staged(d, e, compute_vectors=True, config=cfg)
    assert np.allclose(np.asarray(res1.eigenvalues), np.asarray(res2.eigenvalues))
    assert np.abs(np.abs(np.asarray(res1.eigenvectors))
                  - np.abs(np.asarray(res2.eigenvectors))).max() < 1e-12
    assert "eigenvalues" in timer.times
    assert "backtransformation" in timer.times


def test_pure_recursion_leaf1(rng):
    n = 33
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    full_check(d, e, se.SolverConfig(leaf_size=1))


def test_float32_mode(rng):
    import jax.numpy as jnp
    n = 64
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    cfg = se.SolverConfig(leaf_size=16, dtype=jnp.float32)
    lam, V = se.eigh_tridiagonal(d, e, config=cfg)
    T = dense_from_tridiag(d, e)
    wref = np.linalg.eigvalsh(T)
    nT = np.abs(wref).max()
    assert np.abs(np.asarray(lam) - wref).max() < 1e-4 * nT
    assert np.abs(T @ np.asarray(V) - np.asarray(V) * np.asarray(lam)[None, :]).max() < 1e-3 * nT


def test_single_jit_max_n_autoroutes(rng):
    """Above single_jit_max_n the public entry point must route to the staged
    path (on TPU the single jit OOMs at n=16384; the library call must always
    work) and return identical results."""
    n = 64
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    base = se.SolverConfig(leaf_size=8)
    routed = se.SolverConfig(leaf_size=8, single_jit_max_n=32)
    res1 = se.solve_tridiagonal(d, e, compute_vectors=True, config=base)
    res2 = se.solve_tridiagonal(d, e, compute_vectors=True, config=routed)
    assert np.allclose(np.asarray(res1.eigenvalues),
                       np.asarray(res2.eigenvalues), atol=1e-13)
    assert np.abs(np.abs(np.asarray(res1.eigenvectors))
                  - np.abs(np.asarray(res2.eigenvectors))).max() < 1e-10
    # select= must survive the routing too
    sel = [0, 5, n - 1]
    r3 = se.solve_tridiagonal(d, e, select=sel, config=routed)
    assert r3.eigenvectors.shape == (n, 3)
    assert np.abs(np.abs(np.asarray(r3.eigenvectors))
                  - np.abs(np.asarray(res1.eigenvectors)[:, sel])).max() < 1e-10


