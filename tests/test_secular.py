"""Unit tests for the secular merge kernel against dense numpy oracles."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from symmetric_eigenvalue_tpu.kernels.assemble import assemble_u, rows_through_merge
from symmetric_eigenvalue_tpu.kernels.secular import merge_decompose

KW = dict(eps=2.0 ** -52, deflation_factor=8.0, max_secular_iters=60,
          secular_tol_factor=8.0, use_gu_eisenstat=True)


def run_merge(d, z, rho, **over):
    kw = {**KW, **over}
    fn = functools.partial(merge_decompose, **kw)
    return jax.jit(fn)(jnp.asarray(d), jnp.asarray(z), jnp.asarray(float(rho)))


def check_merge(d, z, rho, tol=5e-14, **over):
    m = len(d)
    rep = run_merge(d, z, rho, **over)
    A = np.diag(d) + rho * np.outer(z, z)
    nA = max(np.abs(np.linalg.eigvalsh(A)).max(), 1.0)
    lam = np.asarray(rep.lam_sorted)
    wref = np.linalg.eigvalsh(A)
    assert np.abs(lam - wref).max() <= tol * nA, "eigenvalues"
    U = np.asarray(assemble_u(rep))
    res = np.abs(A @ U - U * lam[None, :]).max()
    orth = np.abs(U.T @ U - np.eye(m)).max()
    assert res <= tol * nA, f"residual {res}"
    assert orth <= 1e-13, f"orthogonality {orth}"
    return rep, U, lam


def test_random_merge(rng):
    m = 48
    d = np.sort(rng.standard_normal(m) * 10)
    z = rng.standard_normal(m)
    z /= np.linalg.norm(z)
    check_merge(d, z, 3.7)


def test_unsorted_input(rng):
    m = 32
    d = rng.standard_normal(m) * 5   # deliberately unsorted
    z = rng.standard_normal(m)
    check_merge(d, z, 1.3)


def test_tiny_z_entries_deflate(rng):
    m = 40
    d = np.sort(rng.standard_normal(m) * 4)
    z = rng.standard_normal(m)
    z[::4] = 1e-18                        # force z-deflation
    rep, _, _ = check_merge(d, z, 2.0)
    assert int(rep.K) < m


def test_duplicate_poles_rotate(rng):
    m = 24
    d = np.sort(rng.standard_normal(m))
    d[5] = d[6]                            # exact duplicate -> Givens deflation
    d[10] = d[11] = d[12]
    z = rng.standard_normal(m)
    rep, _, _ = check_merge(d, z, 1.0)
    assert int(rep.nrot) >= 3


def test_rho_zero_is_identity(rng):
    m = 16
    d = np.sort(rng.standard_normal(m))
    z = rng.standard_normal(m)
    rep = run_merge(d, z, 0.0)
    assert int(rep.K) == 0
    lam = np.asarray(rep.lam_sorted)
    assert np.allclose(lam, np.sort(d), atol=0)
    U = np.asarray(assemble_u(rep))
    # columns must be unit vectors mapping back to original order
    P = np.zeros((m, m))
    order = np.argsort(d, kind="stable")
    P[order, np.arange(m)] = 1.0
    assert np.allclose(U, P)


def test_near_deflation_cluster(rng):
    """Poles clustered within ~1e-8 but above the deflation tolerance: the
    regime that requires relative-accurate tiny roots (dlaed4 shifting)."""
    m = 30
    base = np.sort(rng.standard_normal(m // 2) * 3)
    d = np.sort(np.concatenate([base, base + 1e-8 * (1 + rng.random(m // 2))]))
    z = rng.standard_normal(m)
    z /= np.linalg.norm(z)
    check_merge(d, z, 1.7, tol=5e-13)


def test_tiny_rho(rng):
    m = 20
    d = np.sort(rng.standard_normal(m) * 2)
    z = rng.standard_normal(m)
    z /= np.linalg.norm(z)
    check_merge(d, z, 1e-10)


def test_huge_rho(rng):
    m = 20
    d = np.sort(rng.standard_normal(m))
    z = rng.standard_normal(m)
    z /= np.linalg.norm(z)
    check_merge(d, z, 1e8, tol=2e-13)


def test_rows_through_merge_matches_u(rng):
    m = 28
    d = np.sort(rng.standard_normal(m) * 3)
    d[4] = d[5]  # trigger a rotation
    z = rng.standard_normal(m)
    rep = run_merge(d, z, 2.2)
    U = np.asarray(assemble_u(rep))
    w = rng.standard_normal((3, m))
    y = np.asarray(rows_through_merge(rep, jnp.asarray(w)))
    assert np.allclose(y, w @ U, atol=1e-12)


def test_assemble_selected_columns(rng):
    m = 28
    d = np.sort(rng.standard_normal(m) * 3)
    z = rng.standard_normal(m)
    rep = run_merge(d, z, 2.2)
    U = np.asarray(assemble_u(rep))
    cols = jnp.asarray([0, 5, 27, 3])
    Usel = np.asarray(assemble_u(rep, cols=cols))
    assert np.allclose(Usel, U[:, np.asarray(cols)])


def test_vmapped_batch(rng):
    k, m = 6, 16
    d = np.sort(rng.standard_normal((k, m)) * 3, axis=1)
    z = rng.standard_normal((k, m))
    rho = np.abs(rng.standard_normal(k)) + 0.1
    fn = jax.vmap(functools.partial(merge_decompose, **KW))
    reps = fn(jnp.asarray(d), jnp.asarray(z), jnp.asarray(rho))
    Us = jax.vmap(assemble_u)(reps)
    for i in range(k):
        A = np.diag(d[i]) + rho[i] * np.outer(z[i], z[i])
        lam = np.asarray(reps.lam_sorted[i])
        U = np.asarray(Us[i])
        assert np.abs(lam - np.linalg.eigvalsh(A)).max() < 1e-12
        assert np.abs(A @ U - U * lam[None, :]).max() < 1e-12


def test_heavy_deflation_wave_replay(rng):
    """Poisson-like merge: most poles deflate pairwise -> exercises the batched
    wave replay path (nrot > 64)."""
    half = 150
    base = np.sort(rng.standard_normal(half) * 3)
    d = np.sort(np.concatenate([base, base + 1e-13 * rng.random(half)]))
    z = rng.standard_normal(2 * half)
    z /= np.linalg.norm(z)
    rep = run_merge(d, z, 1.9)
    assert int(rep.nrot) > 64, "test must hit the wave path"
    assert int(rep.nwave) <= 16
    m = 2 * half
    A = np.diag(d) + 1.9 * np.outer(z, z)
    lam = np.asarray(rep.lam_sorted)
    U = np.asarray(assemble_u(rep))
    nA = np.abs(lam).max()
    assert np.abs(lam - np.linalg.eigvalsh(A)).max() < 1e-12 * nA
    assert np.abs(A @ U - U * lam[None, :]).max() < 1e-12 * nA
    assert np.abs(U.T @ U - np.eye(m)).max() < 1e-12
    # apply_u agrees with materialized U
    from symmetric_eigenvalue_tpu.kernels.assemble import apply_u
    X = jnp.asarray(rng.standard_normal((m, 8)))
    Y = np.asarray(apply_u(rep, X))
    assert np.abs(Y - U @ np.asarray(X)).max() < 1e-12


def test_heavy_deflation_rows_through(rng):
    half = 150
    base = np.sort(rng.standard_normal(half) * 3)
    d = np.sort(np.concatenate([base, base + 1e-13 * rng.random(half)]))
    z = rng.standard_normal(2 * half)
    z /= np.linalg.norm(z)
    rep = run_merge(d, z, 1.9)
    assert int(rep.nrot) > 64
    U = np.asarray(assemble_u(rep))
    w = rng.standard_normal((2, 2 * half))
    y = np.asarray(rows_through_merge(rep, jnp.asarray(w)))
    assert np.abs(y - w @ U).max() < 1e-12


def test_zero_z_on_largest_pole(rng):
    """A legitimate exactly-zero z entry on the largest-magnitude pole: the
    deflation scale masks z == 0 slots (pad-sentinel exclusion,
    merge_partition), so this case must still deflate that slot correctly and
    keep full accuracy for the remaining roots."""
    m = 32
    d = np.sort(rng.standard_normal(m) * 2)
    d[-1] = 50.0                    # dominant pole, far above the rest
    d[0] = -50.0                    # and a dominant negative pole
    z = rng.standard_normal(m)
    z[-1] = 0.0                     # exact zero on the largest pole
    z[0] = 0.0                      # and on the largest negative pole
    z /= np.linalg.norm(z)
    rep, U, lam = check_merge(d, z, 1.9)
    # both zero-z slots must be type-1 deflated (eigenvalue = pole, e_i column)
    assert np.any(np.abs(lam - 50.0) < 1e-12)
    assert np.any(np.abs(lam + 50.0) < 1e-12)


def test_zero_z_entries_everywhere_but_two(rng):
    """Heavy legitimate zero-z deflation (scale comes from only two slots)."""
    m = 24
    d = np.sort(rng.standard_normal(m) * 3)
    z = np.zeros(m)
    z[3] = 0.8
    z[17] = -0.6
    rep, U, lam = check_merge(d, z, 2.5)
    assert int(rep.K) <= 2
