"""Multi-device tests on the virtual 8-device CPU mesh (TPU analog of the
reference's single-host 'mpirun -n p' testing; SURVEY.md §4)."""

import jax
import numpy as np
import pytest

import symmetric_eigenvalue_tpu as se
from symmetric_eigenvalue_tpu.core.tridiag import dense_from_tridiag
from symmetric_eigenvalue_tpu.dist.mesh import make_mesh


def test_virtual_mesh_available():
    assert len(jax.devices()) == 8


def test_sharded_solve_matches_unsharded(rng):
    n = 128
    d = rng.standard_normal(n) * 3
    e = rng.standard_normal(n - 1)
    cfg = se.SolverConfig(leaf_size=8)   # P=16 leaves > 8 devices
    mesh = make_mesh()
    lam0, V0 = se.eigh_tridiagonal(d, e, config=cfg)
    lam1, V1 = se.eigh_tridiagonal(d, e, config=cfg, mesh=mesh)
    assert np.allclose(np.asarray(lam0), np.asarray(lam1), atol=1e-13)
    T = dense_from_tridiag(d, e)
    V1 = np.asarray(V1)
    lam1 = np.asarray(lam1)
    nT = np.abs(lam1).max()
    assert np.abs(T @ V1 - V1 * lam1[None, :]).max() < 1e-12 * nT
    assert np.abs(V1.T @ V1 - np.eye(n)).max() < 1e-12


def test_sharded_eigvals_only(rng):
    n = 96
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    mesh = make_mesh()
    lam = se.eigh_tridiagonal(d, e, eigvals_only=True,
                              config=se.SolverConfig(leaf_size=4), mesh=mesh)
    wref = np.linalg.eigvalsh(dense_from_tridiag(d, e))
    assert np.abs(np.asarray(lam) - wref).max() < 1e-12


def test_mesh_smaller_than_leaves(rng):
    """Mesh larger than some level batch sizes: top levels replicate."""
    n = 64
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    mesh = make_mesh(4)
    lam, V = se.eigh_tridiagonal(d, e, config=se.SolverConfig(leaf_size=16),
                                 mesh=mesh)
    wref = np.linalg.eigvalsh(dense_from_tridiag(d, e))
    assert np.abs(np.asarray(lam) - wref).max() < 1e-12


@pytest.mark.slow
def test_staged_mixed_sharded_at_scale(rng):
    """The shipping pipeline (staged + mixed precision + stepped downsweep +
    refinement) at n=2048 over the full 8-device mesh — the scaled-down twin
    of the driver-run n=4096 dryrun (VERDICT r1 item 1)."""
    from symmetric_eigenvalue_tpu.driver import solve_tridiagonal_staged

    n = 2048
    d = rng.standard_normal(n) * 3
    e = rng.standard_normal(n - 1)
    cfg = se.SolverConfig(leaf_size=64, vec_chunk=1024,
                          mixed_precision_vectors=True)
    mesh = make_mesh()
    res, _ = solve_tridiagonal_staged(d, e, config=cfg, compute_vectors=True,
                                      mesh=mesh)
    lam = np.asarray(res.eigenvalues)
    V = np.asarray(res.eigenvectors)
    nT = np.abs(lam).max()
    resid = np.abs(d[:, None] * V
                   + np.vstack([e[:, None] * V[1:], np.zeros((1, n))])
                   + np.vstack([np.zeros((1, n)), e[:, None] * V[:-1]])
                   - V * lam[None, :]).max()
    assert resid < 1e-12 * nT
    assert np.abs(V.T @ V - np.eye(n)).max() < 1e-10


def test_staged_chunked_with_mesh(rng):
    """Stepped downsweep + column chunking + mesh (slot-sharded top merges)."""
    from symmetric_eigenvalue_tpu.driver import solve_tridiagonal_staged

    n = 96
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    cfg = se.SolverConfig(leaf_size=8, vec_chunk=32)
    mesh = make_mesh()
    res, _ = solve_tridiagonal_staged(d, e, config=cfg, compute_vectors=True,
                                      mesh=mesh)
    T = dense_from_tridiag(d, e)
    lam = np.asarray(res.eigenvalues)
    V = np.asarray(res.eigenvectors)
    nT = np.abs(lam).max()
    assert np.abs(T @ V - V * lam[None, :]).max() < 1e-12 * nT
    assert np.abs(V.T @ V - np.eye(n)).max() < 1e-12
