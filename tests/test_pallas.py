"""Pallas fused Cauchy-matmul kernel, run in interpreter mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental import pallas as pl

import symmetric_eigenvalue_tpu.kernels.pallas.cauchy_matmul as cm


@pytest.fixture
def interpreted(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(cm.pl, "pallas_call", patched)


@pytest.mark.parametrize("prec,tol", [("highest", 1e-5), ("bf16_3x", 5e-4)])
def test_cauchy_matmul_interpret(interpreted, rng, monkeypatch, prec, tol):
    monkeypatch.setenv("SE_DOWNSWEEP_PRECISION", prec)
    m, C = 256, 256
    poles = np.sort(rng.standard_normal(m))
    tau = np.abs(rng.standard_normal(m)) * 1e-3 + 1e-15
    tau[7] = 1e-13                      # near-pole root: needs pair arithmetic
    shift_val = poles.copy()
    zhat = rng.standard_normal(m) * 0.1
    ncolinv = np.abs(rng.standard_normal(m)) + 0.1
    X = rng.standard_normal((m, C)).astype(np.float32)
    Y = np.asarray(cm.cauchy_matmul(
        jnp.asarray(poles), jnp.asarray(shift_val), jnp.asarray(tau),
        jnp.asarray(zhat), jnp.asarray(ncolinv), jnp.asarray(X),
        tj=128, ti=128, tc=128))
    den = (poles[:, None] - shift_val[None, :]) - tau[None, :]
    M = (zhat[:, None] / den) * ncolinv[None, :]
    Yref = M @ X.astype(np.float64)
    rel = np.abs(Y - Yref).max() / np.abs(Yref).max()
    assert rel < tol


def test_split_f64_roundtrip(rng):
    v = jnp.asarray(rng.standard_normal(100) * 1e3)
    hi, lo = cm.split_f64(v)
    assert hi.dtype == jnp.float32 and lo.dtype == jnp.float32
    err = np.abs(np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
                 - np.asarray(v))
    assert err.max() < 1e-10


def test_supported_predicate():
    assert cm.supported(2048, 4096)
    assert not cm.supported(100, 4096)
    assert not cm.supported(2048, 100)


def test_cauchy_matmul_small_m(interpreted, rng, monkeypatch):
    # deep-tree levels: m < 512 runs with full-m tiles (no XLA fallback)
    monkeypatch.setenv("SE_DOWNSWEEP_PRECISION", "highest")
    m, C = 64, 512
    poles = np.sort(rng.standard_normal(m))
    tau = np.abs(rng.standard_normal(m)) * 1e-3 + 1e-15
    shift_val = poles.copy()
    zhat = rng.standard_normal(m) * 0.1
    ncolinv = np.abs(rng.standard_normal(m)) + 0.1
    X = rng.standard_normal((m, C)).astype(np.float32)
    Y = np.asarray(cm.cauchy_matmul(
        jnp.asarray(poles), jnp.asarray(shift_val), jnp.asarray(tau),
        jnp.asarray(zhat), jnp.asarray(ncolinv), jnp.asarray(X)))
    den = (poles[:, None] - shift_val[None, :]) - tau[None, :]
    M = (zhat[:, None] / den) * ncolinv[None, :]
    Yref = M @ X.astype(np.float64)
    rel = np.abs(Y - Yref).max() / np.abs(Yref).max()
    assert cm.supported(m, C)
    assert rel < 1e-5


def test_cauchy_rowsum_interpret(rng):
    import symmetric_eigenvalue_tpu.kernels.pallas.cauchy_rowsum as crs
    from jax.experimental import pallas as _pl
    orig = _pl.pallas_call
    crs.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        for m in (64, 512):
            poles = np.sort(rng.standard_normal(m))
            tau = np.abs(rng.standard_normal(m)) * 1e-3 + 1e-15
            tau[m // 3] = 1e-13           # near-pole root
            shift_val = poles.copy()
            wz = rng.standard_normal((2, m)) * 0.2
            S = np.asarray(crs.cauchy_rowsum(
                jnp.asarray(poles), jnp.asarray(shift_val), jnp.asarray(tau),
                jnp.asarray(wz)))
            den = (poles[:, None] - shift_val[None, :]) - tau[None, :]
            ref = wz @ (1.0 / den)
            # f64-grade: the sums feed the next level's z-vector
            rel = np.abs(S - ref).max() / np.abs(ref).max()
            assert rel < 1e-13, (m, rel)
            assert crs.supported(m, 2)
    finally:
        crs.pl.pallas_call = orig


def test_cauchy_matmul_deflation_skip(interpreted, rng, monkeypatch):
    """kact < m must skip whole contraction blocks bit-exactly: slots are
    survivors-first and ncolinv is zero past kact, so the skipped blocks'
    contributions were exact zeros anyway (Poisson-style heavy deflation)."""
    monkeypatch.setenv("SE_DOWNSWEEP_PRECISION", "bf16_3x")
    m, C, K = 1024, 512, 300
    poles = np.sort(rng.standard_normal(m))
    shift = poles[rng.integers(0, m, m)]
    tau = rng.standard_normal(m) * 1e-8
    zhat = rng.standard_normal(m)
    ninv = np.abs(rng.standard_normal(m)) + 0.5
    ninv[K:] = 0.0                      # deflated slots contribute nothing
    X = rng.standard_normal((m, C)).astype(np.float32)
    args = tuple(jnp.asarray(a) for a in (poles, shift, tau, zhat, ninv, X))
    Y_full = np.asarray(cm.cauchy_matmul(*args))
    Y_skip = np.asarray(cm.cauchy_matmul(*args, kact=K))
    assert np.array_equal(Y_full, Y_skip)
    # batched (vmapped) form — the apply_u_level path
    Kv = jnp.asarray([K, m], dtype=jnp.int32)
    argsb = tuple(jnp.stack([a, a]) for a in args)
    Yb = np.asarray(jax.vmap(
        lambda p, s, t, z, nv, x, k: cm.cauchy_matmul(
            p, s, t, z, nv, x, kact=k))(*argsb, Kv))
    assert np.array_equal(Yb[0], Y_full)
    assert np.array_equal(Yb[1], Y_full)


def test_cauchy_materialize_interpret(interpreted, rng):
    """cauchy_materialize (VMEM pair-f32 U generation, the downsweep ROOT)
    vs the XLA f64 row_block formula, incl. deflated identity columns."""
    m, C, K = 1024, 512, 700
    poles = np.sort(rng.standard_normal(m))
    shift_idx = rng.integers(0, m, m)
    tau = rng.standard_normal(m) * 1e-8
    zhat = rng.standard_normal(m)
    ncol = np.abs(rng.standard_normal(m)) + 0.5
    slots = rng.permutation(m)[:C]
    act = slots < K
    ninv = np.where(act, 1.0 / ncol[slots], 0.0)
    U = np.asarray(cm.cauchy_materialize(
        jnp.asarray(poles), jnp.asarray(poles[shift_idx[slots]]),
        jnp.asarray(tau[slots]), jnp.asarray(zhat), jnp.asarray(ninv),
        jnp.asarray(slots), K))
    denom = (poles[:, None] - poles[shift_idx[slots]][None, :]) \
        - tau[slots][None, :]
    ref = zhat[:, None] / denom / ncol[slots][None, :]
    ref = np.where(act[None, :], ref,
                   (np.arange(m)[:, None] == slots[None, :]))
    scale = np.abs(ref).max()
    assert np.abs(U - ref).max() / scale < 1e-6
    # identity columns are EXACT
    assert np.array_equal(U[:, ~act],
                          (np.arange(m)[:, None] == slots[None, ~act]))
