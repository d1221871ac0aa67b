"""Numpy oracle for the wavefront bulge-chasing decomposition (PLAN_SBR2.md).

Validates, with explicit dense two-sided updates:
  * task rule: task (j, k) applies ONE Householder reflector on rows
    R = [j+kb+1, min(j+(k+1)b, n-1)], zeroing column c (= j for k=0, else
    j+(k-1)b+1) at rows [j+kb+2, ...], keeping the entry at (j+kb+1, c);
  * wave schedule t = 3j + k: all tasks of a wave commute (footprints
    spaced 3b-1 on the diagonal, window cols [r-2b+1, r+3b-2]);
  * fill never exceeds distance 2b-1 from the diagonal;
  * the final matrix is tridiagonal and orthogonally similar to the input.

Run: python tools/oracle_chase_wave.py  (exits nonzero on any violation)
"""

import sys

import numpy as np


def house(x):
    """(v, tau) with (I - tau v v^T) x = (beta, 0, ..., 0), v[0] = 1."""
    x = np.asarray(x, float)
    if x.shape[0] <= 1 or np.all(x[1:] == 0.0):
        return np.zeros_like(x), 0.0
    nrm = np.linalg.norm(x)
    beta = -np.sign(x[0]) * nrm if x[0] != 0 else -nrm
    v = x.copy()
    v[0] -= beta
    tau = (beta - x[0]) / beta
    v /= v[0]
    return v, tau


def tasks_of_wave(t, n, b):
    """[(j, k, r, c)] for wave t (r = reflector row start, c = target col)."""
    out = []
    m = t % 3
    for s in range(0, (t // 3) + 1):
        j = t // 3 - s
        k = m + 3 * s
        if j > n - 3:
            continue
        if j + k * b + 2 > n - 1:      # zero range empty
            continue
        if k > 0 and j + (k - 1) * b + 1 > n - 1:
            continue
        r = j + k * b + 1
        c = j if k == 0 else j + (k - 1) * b + 1
        out.append((j, k, r, c))
    return out


def run(n, b, rng, check_every=1):
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    i, j = np.indices((n, n))
    A[np.abs(i - j) > b] = 0.0
    A0 = A.copy()

    nwaves = 3 * (n - 3) + 1
    applied = 0
    for t in range(nwaves):
        tasks = tasks_of_wave(t, n, b)
        # footprint disjointness within the wave: row starts spaced >= 3b-1
        rs = sorted(task[2] for task in tasks)
        for a, bb in zip(rs, rs[1:]):
            assert bb - a >= 3 * b - 1, (t, rs)
        for (jj, k, r, c) in tasks:
            hi = min(r + b, n)
            x = A[r:hi, c]
            # window-extent invariant: rows R have no mass outside
            # cols [r-2b+1, r+3b-2] (what the JAX strip will gather)
            lo_c, hi_c = max(r - 2 * b + 1, 0), min(r + 3 * b - 1, n)
            outside = np.abs(A[r:hi, :lo_c]).max() if lo_c > 0 else 0.0
            if hi_c < n:
                outside = max(outside, np.abs(A[r:hi, hi_c:]).max())
            assert outside == 0.0, (t, jj, k, "mass outside window", outside)
            v, tau = house(x)
            if tau != 0.0:
                w = tau * (A[r:hi, :].T @ v)     # A <- H A H, H = I - tau vv^T
                A[r:hi, :] -= np.outer(v, w)
                w = tau * (A[:, r:hi] @ v)
                A[:, r:hi] -= np.outer(w, v)
            # exact-zero bookkeeping (the disjointness proof relies on
            # structural zeros, not just small values)
            A[r + 1:hi, c] = 0.0
            A[c, r + 1:hi] = 0.0
            applied += 1
        if t % check_every == 0:
            d = np.abs(np.subtract.outer(np.arange(n), np.arange(n)))
            assert np.abs(A[d > 2 * b - 1]).max() == 0.0, (t, "fill too deep")

    d = np.abs(np.subtract.outer(np.arange(n), np.arange(n)))
    off = np.abs(A[d > 1]).max()
    lam0 = np.linalg.eigvalsh(A0)
    lam1 = np.linalg.eigvalsh(np.tril(A, 1) * 0 + np.diag(np.diag(A))
                              + np.diag(np.diag(A, 1), 1)
                              + np.diag(np.diag(A, 1), -1))
    err = np.abs(lam0 - lam1).max() / max(np.abs(lam0).max(), 1.0)
    print(f"n={n} b={b}: tasks={applied} off-tridiag={off:.2e} "
          f"eig err={err:.2e}")
    assert off < 1e-12, off
    assert err < 1e-12, err


def main():
    rng = np.random.default_rng(0)
    for (n, b) in [(24, 2), (40, 3), (64, 4), (96, 8), (130, 8), (128, 16),
                   (200, 5), (256, 32)]:
        run(n, b, rng)
    print("oracle OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
