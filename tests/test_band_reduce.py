"""Stage-1 SBR (dense -> band) correctness vs dense numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from symmetric_eigenvalue_tpu.kernels.band_reduce import reduce_to_band
from symmetric_eigenvalue_tpu.kernels.tridiagonalize import apply_q


@pytest.mark.parametrize("n,b", [(64, 8), (96, 16), (100, 8), (33, 8),
                                 (40, 40)])
def test_reduce_to_band(n, b, rng):
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    B, Yt, taus = jax.jit(lambda A: reduce_to_band(A, b))(jnp.asarray(A))
    B = np.asarray(B)

    # band structure
    mask = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :]) > b
    assert np.abs(np.where(mask, B, 0.0)).max() < 1e-13

    # orthogonal similarity: same spectrum, and A Q = Q B with the
    # compact-WY application (reflector rows shifted by b reuse apply_q)
    w0 = np.linalg.eigvalsh(A)
    w1 = np.linalg.eigvalsh((B + B.T) / 2)
    assert np.abs(w0 - w1).max() < 1e-12 * max(np.abs(w0).max(), 1.0)
    Q = np.asarray(apply_q(Yt, taus, jnp.eye(n, dtype=jnp.float64),
                           panel=b))
    assert np.abs(A @ Q - Q @ B).max() < 1e-12
    assert np.abs(Q.T @ Q - np.eye(n)).max() < 1e-13


@pytest.mark.parametrize("n,b", [(48, 8), (100, 16), (65, 8)])
def test_two_stage_full_pipeline(n, b, rng):
    """dense -> band -> tridiagonal, with eigenvectors back through
    Q = Q1 Q2 (stage-1 compact-WY + stage-2 rotation replay)."""
    from symmetric_eigenvalue_tpu.kernels.band_reduce import (apply_q2,
                                                              band_to_tridiag)
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    B, Yt, taus = jax.jit(lambda A: reduce_to_band(A, b))(jnp.asarray(A))
    d, e, cs = jax.jit(lambda B: band_to_tridiag(B, b))(B)
    d, e = np.asarray(d), np.asarray(e)
    T = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    w0 = np.linalg.eigvalsh(A)
    assert np.abs(w0 - np.linalg.eigvalsh(T)).max() < 1e-12 * max(
        1.0, np.abs(w0).max())
    Q2I = np.asarray(apply_q2(n, b, cs, jnp.eye(n, dtype=jnp.float64)))
    Q = np.asarray(apply_q(Yt, taus, jnp.asarray(Q2I), panel=b))
    assert np.abs(A @ Q - Q @ T).max() < 1e-12
    assert np.abs(Q.T @ Q - np.eye(n)).max() < 1e-13


def test_chase_schedule_matches_fill_scan(rng):
    """The static (pi, pj) -> (pi + b, pi - 1) chase recurrence must hit
    exactly the fill a dense simulation observes."""
    n, b = 24, 5
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    A[np.abs(np.arange(n)[:, None] - np.arange(n)[None, :]) > b] = 0.0

    def rot2(M, p, c, s):
        Rp, Rq = M[p - 1].copy(), M[p].copy()
        M[p - 1], M[p] = c * Rp - s * Rq, s * Rp + c * Rq
        Cp, Cq = M[:, p - 1].copy(), M[:, p].copy()
        M[:, p - 1], M[:, p] = c * Cp - s * Cq, s * Cp + c * Cq

    from symmetric_eigenvalue_tpu.kernels.band_reduce import _chase_schedule
    M = A.copy()
    sched = _chase_schedule(n, b)
    outside = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :]) > b
    for t, (pi, pj) in enumerate(sched):
        # a chase-continuation entry has pi - pj == b + 1 (it clears the
        # bulge the previous rotation pushed); at every chase START the
        # matrix must be back inside the band — i.e. the recurrence visited
        # every fill element
        if pi - pj <= b:
            assert np.abs(M[outside]).max() < 1e-12, f"fill missed at t={t}"
        x, y = M[pi - 1, pj], M[pi, pj]
        r = np.hypot(x, y)
        c, s = (1.0, 0.0) if r == 0 else (x / r, -y / r)
        rot2(M, pi, c, s)
    offtri = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :]) > 1
    assert np.abs(M[offtri]).max() < 1e-12


def test_reduce_to_band_small_noop(rng):
    # n <= b + 1: already banded, identity transform
    A = rng.standard_normal((6, 6))
    A = (A + A.T) / 2
    B, Yt, taus = reduce_to_band(jnp.asarray(A), 8)
    assert np.abs(np.asarray(B) - A).max() == 0.0
    assert np.asarray(taus).max() == 0.0


@pytest.mark.parametrize("n,b", [(24, 2), (96, 8), (130, 8), (128, 16),
                                 (200, 5), (64, 70)])
def test_wavefront_chase(n, b, rng):
    """band_to_tridiag_wave: orthogonal similarity, exact reconstruction
    through apply_q2_wave, eigenvalue preservation (incl. non-divisible n/b
    and b >= n).  Decomposition oracle: tools/oracle_chase_wave.py."""
    from symmetric_eigenvalue_tpu.kernels.band_reduce import (
        apply_q2_wave, band_to_tridiag_wave)

    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    A[np.abs(np.arange(n)[:, None] - np.arange(n)[None, :]) > b] = 0.0
    d, e, vlog = jax.jit(lambda B: band_to_tridiag_wave(B, b))(jnp.asarray(A))
    d, e = np.asarray(d), np.asarray(e)
    T = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    w0 = np.linalg.eigvalsh(A)
    w1 = np.linalg.eigvalsh(T)
    assert np.abs(w0 - w1).max() < 1e-12 * max(np.abs(w0).max(), 1.0)
    Q2 = np.asarray(apply_q2_wave(n, b, vlog, jnp.eye(n, dtype=jnp.float64)))
    assert np.abs(Q2.T @ Q2 - np.eye(n)).max() < 1e-13
    assert np.abs(Q2.T @ A @ Q2 - T).max() < 1e-12


def test_wavefront_vs_sequential_chase(rng):
    """Wave and sequential chases produce orthogonally-similar tridiagonals
    of the same matrix (eigenvalues equal; entries may differ in sign)."""
    from symmetric_eigenvalue_tpu.kernels.band_reduce import (
        band_to_tridiag, band_to_tridiag_wave)

    n, b = 72, 6
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    A[np.abs(np.arange(n)[:, None] - np.arange(n)[None, :]) > b] = 0.0
    dw, ew, _ = band_to_tridiag_wave(jnp.asarray(A), b)
    ds, es, _ = band_to_tridiag(jnp.asarray(A), b)
    Tw = np.diag(np.asarray(dw)) + np.diag(np.asarray(ew), 1) \
        + np.diag(np.asarray(ew), -1)
    Ts = np.diag(np.asarray(ds)) + np.diag(np.asarray(es), 1) \
        + np.diag(np.asarray(es), -1)
    assert np.abs(np.linalg.eigvalsh(Tw) - np.linalg.eigvalsh(Ts)).max() \
        < 1e-12


def test_blocked_apply_matches_per_sweep(rng):
    """apply_q2_wave_blocked (compact-WY wavefront, GEMM rate) must equal the
    per-sweep rank-1 reference application to roundoff."""
    from symmetric_eigenvalue_tpu.kernels.band_reduce import (
        apply_q2_wave, apply_q2_wave_blocked, band_to_tridiag_wave)

    n, b = 130, 8
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    A[np.abs(np.arange(n)[:, None] - np.arange(n)[None, :]) > b] = 0.0
    _, _, vlog = band_to_tridiag_wave(jnp.asarray(A), b)
    X = rng.standard_normal((n, 7))
    Ya = np.asarray(apply_q2_wave(n, b, vlog, jnp.asarray(X)))
    Yb = np.asarray(apply_q2_wave_blocked(n, b, vlog, jnp.asarray(X)))
    assert np.abs(Ya - Yb).max() < 1e-13


def test_reduce_to_band_bucketed_matches(rng):
    """Bucketed trailing-submatrix reduction (statically shrunk per bucket)
    must match the single-pass result to roundoff, incl. the symmetrized
    bucket-boundary lower band."""
    n, b = 130, 16
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    B1, Y1, t1 = reduce_to_band(jnp.asarray(A), b, buckets=1)
    B4, Y4, t4 = reduce_to_band(jnp.asarray(A), b, buckets=4)
    assert np.abs(np.asarray(B1) - np.asarray(B4)).max() < 1e-12
    assert np.abs(np.asarray(Y1) - np.asarray(Y4)).max() < 1e-12
    assert np.abs(np.asarray(t1) - np.asarray(t4)).max() < 1e-14
    B4 = np.asarray(B4)
    assert np.abs(B4 - B4.T).max() == 0.0


def test_staged_chase_matches_single_jit(rng):
    """band_to_tridiag_wave_staged (host-segmented dispatches, donated
    carry) must be BIT-identical to the in-jit chase: same body, same
    order, only the dispatch boundaries differ."""
    from symmetric_eigenvalue_tpu.kernels.band_reduce import (
        band_to_tridiag_wave, band_to_tridiag_wave_staged)

    n, b = 130, 8
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    A[np.abs(np.arange(n)[:, None] - np.arange(n)[None, :]) > b] = 0.0
    d1, e1, (V1, t1) = band_to_tridiag_wave(jnp.asarray(A), b)
    d2, e2, (V2, t2) = band_to_tridiag_wave_staged(jnp.asarray(A), b,
                                                   seg_waves=37)
    assert np.abs(np.asarray(d1) - np.asarray(d2)).max() == 0.0
    assert np.abs(np.asarray(e1) - np.asarray(e2)).max() == 0.0
    assert np.abs(np.asarray(V1) - np.asarray(V2)).max() == 0.0
    assert np.abs(np.asarray(t1) - np.asarray(t2)).max() == 0.0


def test_wave_update_modes_agree(rng, monkeypatch):
    """The three P-window write implementations (2-D scatter, linearized 1-D
    scatter, per-slot dynamic_update_slice) are mathematically identical;
    TPU defaults to 'dus' (the scatters cost ~24 ms/wave there and trip the
    execution watchdog — see _chase_update_mode)."""
    from symmetric_eigenvalue_tpu.kernels.band_reduce import (
        apply_q2_wave_blocked, band_to_tridiag_wave)

    n, b = 100, 8
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    A[np.abs(np.arange(n)[:, None] - np.arange(n)[None, :]) > b] = 0.0
    X = rng.standard_normal((n, 5))
    outs = []
    for mode in ("scatter2d", "scatter1d", "dus"):
        monkeypatch.setenv("SE_WAVE_UPDATE", mode)
        d, e, vlog = band_to_tridiag_wave(jnp.asarray(A), b)
        Y = apply_q2_wave_blocked(n, b, vlog, jnp.asarray(X))
        outs.append((np.asarray(d), np.asarray(e), np.asarray(Y)))
    for d, e, Y in outs[1:]:
        assert np.abs(d - outs[0][0]).max() < 1e-13
        assert np.abs(e - outs[0][1]).max() < 1e-13
        assert np.abs(Y - outs[0][2]).max() < 1e-13
