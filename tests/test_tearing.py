import numpy as np
import jax.numpy as jnp

from symmetric_eigenvalue_tpu.core.tearing import tear
from symmetric_eigenvalue_tpu.core.tree import build_plan
from symmetric_eigenvalue_tpu.core.tridiag import dense_from_tridiag


def reconstruct(d_t, e, plan, betas, thetas, n):
    """Sum of torn blocks + all rank-one corrections must equal T exactly."""
    T = np.zeros((n, n))
    T += np.diag(np.asarray(d_t))
    e = np.asarray(e)
    # off-diagonals: those at boundaries were removed (became betas)
    boundary = set()
    for lv in plan.levels:
        boundary.update(lv.boundary_rows)
    for i in range(n - 1):
        if i not in boundary:
            T[i, i + 1] = e[i]
            T[i + 1, i] = e[i]
    for li, lv in enumerate(plan.levels):
        for j, r in enumerate(lv.boundary_rows):
            beta = float(betas[li][j])
            theta = float(thetas[li][j])
            v = np.zeros(n)
            v[r] = 1.0
            v[r + 1] = 1.0 / theta
            T += beta * theta * np.outer(v, v)
    return T


def test_tearing_reconstructs_T(rng):
    for n, leaf in [(16, 4), (37, 4), (100, 8)]:
        d = rng.standard_normal(n)
        e = rng.standard_normal(n - 1)
        plan = build_plan(n, leaf)
        d_t, betas, thetas = tear(jnp.asarray(d), jnp.asarray(e), plan)
        T = reconstruct(d_t, e, plan, betas, thetas, n)
        assert np.allclose(T, dense_from_tridiag(d, e), atol=1e-12)


def test_rho_always_nonnegative(rng):
    n = 64
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    plan = build_plan(n, 8)
    _, betas, thetas = tear(jnp.asarray(d), jnp.asarray(e), plan)
    for b, t in zip(betas, thetas):
        assert np.all(np.asarray(b) * np.asarray(t) >= 0)


def test_zero_beta_allowed():
    n = 8
    d = np.arange(1.0, n + 1)
    e = np.zeros(n - 1)
    plan = build_plan(n, 2)
    d_t, betas, thetas = tear(jnp.asarray(d), jnp.asarray(e), plan)
    assert np.allclose(np.asarray(d_t), d)  # nothing subtracted
    for t in thetas:
        assert np.all(np.asarray(t) == 1.0)  # sign(0) -> +1 convention
