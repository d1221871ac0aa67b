"""Unit tests for the shared double-word (f32-pair) value toolkit.

These are pure jnp functions (no pallas_call), so they run under jit on the
CPU backend and are compared against numpy f64 — which has MORE precision
(2^-53) than the pairs target (~2^-47), making it a valid oracle.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from symmetric_eigenvalue_tpu.kernels.pallas import dword_ops as dw


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _pairs(rng, shape, scale_lo=-6, scale_hi=6):
    """Random f64 values across magnitudes, returned with their f32 pairs."""
    v = rng.standard_normal(shape) * np.exp2(
        rng.uniform(scale_lo, scale_hi, shape))
    h, l = dw.from_f64(jnp.asarray(v))
    return v, h, l


def _rel(got, want):
    return np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-300))


def test_from_to_roundtrip(rng):
    v, h, l = _pairs(rng, (512,))
    back = np.asarray(dw.to_f64(h, l))
    assert _rel(back, v) < 2.0 ** -47


def test_add_sub(rng):
    a, ah, al = _pairs(rng, (512,))
    b, bh, bl = _pairs(rng, (512,))
    s = np.asarray(dw.to_f64(*jax.jit(dw.add)(ah, al, bh, bl)))
    d = np.asarray(dw.to_f64(*jax.jit(dw.sub)(ah, al, bh, bl)))
    # additive cancellation can amplify relative error; compare absolutely
    # against the operand scale like the kernels' own error budget does
    scale = np.maximum(np.abs(a) + np.abs(b), 1e-300)
    assert np.max(np.abs(s - (a + b)) / scale) < 2.0 ** -46
    assert np.max(np.abs(d - (a - b)) / scale) < 2.0 ** -46


def test_mul_f32_exact(rng):
    # the partial-product path must be EXACT for plain f32 inputs
    a = rng.standard_normal((2048,)).astype(np.float32)
    b = rng.standard_normal((2048,)).astype(np.float32)
    h, l = jax.jit(dw.mul_f32)(jnp.asarray(a), jnp.asarray(b))
    got = np.asarray(h, np.float64) + np.asarray(l, np.float64)
    want = a.astype(np.float64) * b.astype(np.float64)
    assert np.array_equal(got, want)


def test_mul(rng):
    a, ah, al = _pairs(rng, (512,))
    b, bh, bl = _pairs(rng, (512,))
    got = np.asarray(dw.to_f64(*jax.jit(dw.mul)(ah, al, bh, bl)))
    assert _rel(got, a * b) < 2.0 ** -46


def test_div(rng):
    a, ah, al = _pairs(rng, (512,))
    b, bh, bl = _pairs(rng, (512,))
    got = np.asarray(dw.to_f64(*jax.jit(dw.div)(ah, al, bh, bl)))
    assert _rel(got, a / b) < 2.0 ** -45


def test_sqrt(rng):
    a, ah, al = _pairs(rng, (512,))
    a = np.abs(a)
    ah, al = dw.from_f64(jnp.asarray(a))
    got = np.asarray(dw.to_f64(*jax.jit(dw.sqrt)(ah, al)))
    assert _rel(got, np.sqrt(a)) < 2.0 ** -46


def test_sqrt_zero_and_pad_lanes(rng):
    h = jnp.asarray(np.array([0.0, -1.0, 4.0], np.float32))
    l = jnp.zeros_like(h)
    sh, sl = dw.sqrt(h, l)
    np.testing.assert_array_equal(np.asarray(sh), [0.0, 0.0, 2.0])
    np.testing.assert_array_equal(np.asarray(sl), [0.0, 0.0, 0.0])


def test_sum_pairwise(rng):
    # adversarial: large cancellation across lanes
    v = rng.standard_normal((8, 1024))
    v[:, 512:] = -v[:, :512] * (1 + 1e-9)
    h, l = dw.from_f64(jnp.asarray(v))
    sh, sl = jax.jit(lambda h, l: dw.sum_pairwise(h, l, axis=1))(h, l)
    got = np.asarray(dw.to_f64(sh, sl))
    want = v.sum(axis=1)
    scale = np.abs(v).sum(axis=1)
    assert np.max(np.abs(got - want) / scale) < 2.0 ** -44


def test_ops_at_extreme_scales(rng):
    # Callers prescale to O(1), but intermediate pair values roam; make sure
    # nothing degrades across 2^+-25.  (Far outside that, e.g. 2^-60 inputs,
    # product LO words fall below f32's normal range and flush — the same
    # documented envelope as dword_matmul's O(1)-prescale precondition.)
    for s in (-25, 0, 25):
        a, ah, al = _pairs(rng, (256,), s - 1, s + 1)
        b, bh, bl = _pairs(rng, (256,), s - 1, s + 1)
        got = np.asarray(dw.to_f64(*dw.mul(ah, al, bh, bl)))
        assert _rel(got, a * b) < 2.0 ** -45
        got = np.asarray(dw.to_f64(*dw.div(ah, al, bh, bl)))
        assert _rel(got, a / b) < 2.0 ** -44
