"""Mixed-precision epilogue tests: refinement triage, rescue, profiling and
the fused small-n backtransformation.

Split from test_solver.py: XLA:CPU's backend_compile segfaults after ~27
compile-heavy tests in ONE process on this host (an accumulation effect —
see CLAUDE.md "Hard-won host/infra facts"); keeping the epilogue tests in
their own file keeps both files under the budget, and the conftest
module-scope jax.clear_caches() fixture resets between them."""

import numpy as np
import pytest

import symmetric_eigenvalue_tpu as se
from symmetric_eigenvalue_tpu.core.tridiag import dense_from_tridiag


def test_staged_profile_subphases(rng, monkeypatch):
    """SE_PROFILE_BACKTRANSFORM=1 records per-step walls of the mixed
    epilogue (downsweep / refine passes / orthonormalizations) without
    changing results."""
    from symmetric_eigenvalue_tpu.driver import solve_tridiagonal_staged
    n = 64
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    cfg = se.SolverConfig(leaf_size=8, mixed_precision_vectors=True)
    res0, _ = solve_tridiagonal_staged(d, e, compute_vectors=True, config=cfg)
    monkeypatch.setenv("SE_PROFILE_BACKTRANSFORM", "1")
    res1, timer = solve_tridiagonal_staged(d, e, compute_vectors=True,
                                           config=cfg)
    if "bt.fused_bt" in timer.times:
        # fused small-n route (TPU default; SE_FORCE_FUSED_BT=1 on CPU):
        # downsweep + pass1 + ortho + residuals are one dispatch
        assert "bt.fused_bt" in timer.times
    else:
        assert "bt.downsweep" in timer.times
        assert "bt.refine_pass1" in timer.times
        assert "bt.ortho_final" in timer.times
    assert np.abs(np.asarray(res0.eigenvectors)
                  - np.asarray(res1.eigenvectors)).max() == 0.0


def test_fused_backtransform_matches(rng, monkeypatch):
    """The fused small-n backtransformation (one jit: downsweep + refine
    pass1 + planned cluster-orth + residuals; TPU default, forced here on
    CPU) returns the same eigenvalues and target-meeting vectors as the
    stepped path — including with a sparse eigenvector selection."""
    from symmetric_eigenvalue_tpu.driver import solve_tridiagonal_staged
    n = 256
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    cfg = se.SolverConfig(leaf_size=32, mixed_precision_vectors=True)
    res0, _ = solve_tridiagonal_staged(d, e, compute_vectors=True, config=cfg)
    monkeypatch.setenv("SE_FORCE_FUSED_BT", "1")
    res1, _ = solve_tridiagonal_staged(d, e, compute_vectors=True, config=cfg)
    lam0 = np.asarray(res0.eigenvalues)
    lam1 = np.asarray(res1.eigenvalues)
    assert np.array_equal(lam0, lam1)
    V = np.asarray(res1.eigenvectors)
    T = np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1) \
        + np.diag(np.asarray(e), -1)
    normT = np.abs(lam1).max()
    assert np.abs(T @ V - V * lam1[None, :]).max() < 1e-12 * normT
    assert np.abs(V.T @ V - np.eye(n)).max() < 1e-11

    sel = np.arange(0, n, 3)
    res2, _ = solve_tridiagonal_staged(d, e, select=sel, config=cfg)
    Vs = np.asarray(res2.eigenvectors)
    assert np.abs(T @ Vs - Vs * lam1[sel][None, :]).max() < 1e-12 * normT


def test_mixed_precision_staged(rng):
    from symmetric_eigenvalue_tpu.driver import solve_tridiagonal_staged
    n = 200
    d = rng.standard_normal(n) * 5
    e = rng.standard_normal(n - 1) * 2
    cfg = se.SolverConfig(leaf_size=16, vec_chunk=64,
                          mixed_precision_vectors=True)
    res, _ = solve_tridiagonal_staged(d, e, config=cfg, compute_vectors=True)
    T = dense_from_tridiag(d, e)
    lam = np.asarray(res.eigenvalues)
    V = np.asarray(res.eigenvectors)
    assert V.dtype == np.float64
    nT = np.abs(lam).max()
    assert np.abs(T @ V - V * lam[None, :]).max() < 1e-12 * nT
    assert np.abs(V.T @ V - np.eye(n)).max() < 1e-10


def test_mixed_precision_clustered(rng):
    from symmetric_eigenvalue_tpu.driver import solve_tridiagonal_staged
    k = 10
    m = 2 * k + 1
    dw = np.abs(np.arange(m) - k).astype(float)
    ew = np.ones(m - 1)
    D = np.concatenate([dw] * 6)
    E = np.concatenate(sum([[ew, [1e-9]] for _ in range(5)], []) + [ew])
    cfg = se.SolverConfig(leaf_size=16, mixed_precision_vectors=True)
    res, _ = solve_tridiagonal_staged(D, E, config=cfg, compute_vectors=True)
    T = dense_from_tridiag(D, E)
    lam = np.asarray(res.eigenvalues)
    V = np.asarray(res.eigenvectors)
    n = len(D)
    nT = np.abs(lam).max()
    assert np.abs(T @ V - V * lam[None, :]).max() < 1e-12 * nT
    assert np.abs(V.T @ V - np.eye(n)).max() < 1e-9


def test_refine_rescue_from_clipped_spike(rng, monkeypatch):
    """A spike pass whose back-substitution clipped returns a GARBAGE column
    with the 1e30 residual sentinel (post-fix honesty; the pre-fix kernel
    reported ~1e-25 and the n=16384 headline recorded residual 0.15*||T||).
    Both spike passes failing must trigger the measured-residual XLA rescue,
    and the final pipeline output must still meet the residual target."""
    import jax.numpy as jnp
    from symmetric_eigenvalue_tpu.driver import solve_tridiagonal_staged
    from symmetric_eigenvalue_tpu.kernels import refine
    from symmetric_eigenvalue_tpu.kernels.pallas import spike_solve

    n = 768
    d = np.linspace(1.0, 100.0, n)          # scheme 1: well-separated
    e = -np.ones(n - 1)
    T = dense_from_tridiag(d, e)
    w = np.linalg.eigvalsh(T)
    lam_target = w[np.argmin(np.abs(w - 50.0))]
    g = np.sin(np.arange(n) * 2.17)
    g /= np.linalg.norm(g)

    def fake_spike(dd, ee, lam_c, V_c, nb=128, chunk=2048, **kw):
        # real XLA refinement, then simulate a clipped cascade on the column
        # whose shift matches lam_target (in both pass 1 and the alt pass)
        X = refine.inverse_iteration(dd, ee, lam_c, V_c, steps=1, block=nb)
        lam_np = np.asarray(lam_c)
        Xn = np.array(X)
        Tx = np.asarray(dd)[:, None] * Xn
        Tx[:-1] += np.asarray(ee)[:, None] * Xn[1:]
        Tx[1:] += np.asarray(ee)[:, None] * Xn[:-1]
        res = np.linalg.norm(Tx - Xn * lam_np[None, :], axis=0)
        # the staged driver prescales: match lam_target in those units
        hit = np.abs(lam_np * (np.abs(d).max() + 2.0) - lam_target) < 1e-8
        if hit.any():
            Xn[:, hit] = g[:, None]
            res[hit] = 1e30
        return jnp.asarray(Xn), jnp.asarray(res)

    monkeypatch.setattr(spike_solve, "spike_refine", fake_spike)
    monkeypatch.setenv("SE_FORCE_SPIKE", "1")
    monkeypatch.setenv("SE_PROFILE_BACKTRANSFORM", "1")
    # spike on BOTH passes so the fake corrupts twice and the rescue stage
    # (real XLA solves + measured residuals) must do the healing
    res, timer = solve_tridiagonal_staged(
        d, e, config=se.SolverConfig(leaf_size=32,
                                     use_pallas_refine_extra=True),
        compute_vectors=True)
    assert "bt.refine_rescue" in timer.times, timer.times
    lam = np.asarray(res.eigenvalues)
    V = np.asarray(res.eigenvectors)
    nT = np.abs(lam).max()
    assert np.abs(T @ V - V * lam[None, :]).max() < 1e-12 * nT
    assert np.abs(V.T @ V - np.eye(n)).max() < 1e-10


def test_grouped_downsweep_refine(rng, monkeypatch):
    """The column-grouped downsweep+refine path (huge-n HBM bound: the full
    f32 downsweep output never coexists with the f64 refined vectors; forced
    here with a tiny SE_GROUPED_BT_BYTES) matches the plain staged path's
    targets, including with a sparse selection and a non-multiple group."""
    from symmetric_eigenvalue_tpu.driver import solve_tridiagonal_staged
    n = 512
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    cfg = se.SolverConfig(leaf_size=32, vec_chunk=128,
                          mixed_precision_vectors=True)
    res0, _ = solve_tridiagonal_staged(d, e, compute_vectors=True, config=cfg)
    monkeypatch.setenv("SE_GROUPED_BT_BYTES", "1")
    res1, timer = solve_tridiagonal_staged(d, e, compute_vectors=True,
                                           config=cfg)
    lam0 = np.asarray(res0.eigenvalues)
    lam1 = np.asarray(res1.eigenvalues)
    assert np.array_equal(lam0, lam1)
    T = dense_from_tridiag(d, e)
    V = np.asarray(res1.eigenvectors)
    assert V.dtype == np.float64
    nT = np.abs(lam1).max()
    assert np.abs(T @ V - V * lam1[None, :]).max() < 1e-12 * nT
    assert np.abs(V.T @ V - np.eye(n)).max() < 1e-10

    # sparse selection whose count is NOT a multiple of the group width
    sel = np.arange(0, n, 3)
    res2, _ = solve_tridiagonal_staged(d, e, select=sel, config=cfg)
    Vs = np.asarray(res2.eigenvectors)
    assert np.abs(T @ Vs - Vs * lam1[sel][None, :]).max() < 1e-12 * nT


def test_streamed_solve_matches_checks(rng):
    """solve_tridiagonal_streamed: eigenvalues match the staged solve
    exactly; every streamed block is residual-accurate, internally
    orthonormal, and cross-orthogonal to its neighbor (the halo'd-window
    boundary-cluster property the N65536_FULL.json artifact relies on).

    Ref analog: writeResults streams eigenvectors one at a time
    (filehandling.c:369-507); residual semantics filehandling.c:511-537."""
    import jax.numpy as jnp

    from symmetric_eigenvalue_tpu.core.tridiag import residual_norms
    from symmetric_eigenvalue_tpu.driver import (solve_tridiagonal_staged,
                                                 solve_tridiagonal_streamed)
    from symmetric_eigenvalue_tpu.utils.checks import (max_cross_ortho_error,
                                                       max_ortho_error)
    n = 384
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    cfg = se.SolverConfig(leaf_size=32, mixed_precision_vectors=True)
    lam_ref, _ = solve_tridiagonal_staged(d, e, config=cfg)
    lam, blocks, timer = solve_tridiagonal_streamed(
        d, e, config=cfg, group=128, halo=32)
    assert np.array_equal(np.asarray(lam), np.asarray(lam_ref.eigenvalues))
    norm_t = float(np.abs(np.asarray(lam)).max())
    prev = None
    starts = []
    for a, Vo in blocks:
        starts.append(a)
        w = int(Vo.shape[1])
        res = float(jnp.max(residual_norms(
            jnp.asarray(d), jnp.asarray(e), lam[a:a + w], Vo)))
        assert res <= 1e-12 * norm_t
        assert max_ortho_error(Vo) <= 1e-11
        if prev is not None:
            assert max_cross_ortho_error(prev, Vo) <= 1e-11
        prev = Vo
    assert starts == [0, 128, 256]
    assert "eigenvalues" in timer.times
    assert "backtransformation_streamed" in timer.times


def test_streamed_solve_single_window(rng):
    """n small enough that one window covers everything: the window is
    computed once and sliced per group."""
    from symmetric_eigenvalue_tpu.driver import solve_tridiagonal_streamed
    from symmetric_eigenvalue_tpu.utils.checks import max_ortho_error
    n = 96
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    cfg = se.SolverConfig(leaf_size=16, mixed_precision_vectors=True)
    lam, blocks, _ = solve_tridiagonal_streamed(d, e, config=cfg,
                                                group=64, halo=32)
    got = np.concatenate([np.asarray(Vo) for _, Vo in blocks], axis=1)
    assert got.shape == (n, n)
    assert max_ortho_error(got) <= 1e-11
