"""Validate the clip-honesty fix on hardware: the 4 garbled columns of the
n=16384 headline must now carry the 1e30 sentinel, and a full staged solve
with the spike path on must meet the residual target."""
import os
import sys
import time

os.environ.setdefault("JAX_ENABLE_X64", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from symmetric_eigenvalue_tpu.kernels.pallas import spike_solve


def say(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


z = np.load("/tmp/diag_ref_16384.npz")
d, e, lam, V = z["d"], z["e"], z["lam"], z["V"]
n = d.shape[0]
dj, ej, lamj, Vj = (jnp.asarray(a) for a in (d, e, lam, V))
snorm = float(jnp.max(jnp.abs(dj)) + 2 * jnp.max(jnp.abs(ej)))

X, rest = spike_solve.spike_refine(dj / snorm, ej / snorm, lamj / snorm,
                                   Vj.copy(), nb=128, chunk=2048)
rest = np.asarray(rest)
flagged = np.nonzero(rest >= 1e29)[0]
say(f"flagged columns: {flagged.tolist()} (expect ~[5396, 8408, 8968, 14708])")


def residuals(d, e, lam, X):
    Tx = d[:, None] * X
    Tx = Tx.at[:-1].add(e[:, None] * X[1:])
    Tx = Tx.at[1:].add(e[:, None] * X[:-1])
    return jnp.linalg.norm(Tx - X * lam[None, :], axis=0)


r1 = np.asarray(residuals(dj, ej, lamj, X.astype(jnp.float64)))
unflagged = np.setdiff1d(np.arange(n), flagged)
say(f"unflagged residual max: {r1[unflagged].max() / snorm:.3e} *||T|| "
    f"(flagged-col true residual: "
    f"{r1[flagged].max() / snorm if flagged.size else 0:.3e})")

# full staged solve, spike ON (the failing headline path)
from symmetric_eigenvalue_tpu import SolverConfig
from symmetric_eigenvalue_tpu.driver import solve_tridiagonal_staged
t0 = time.time()
res, timer = solve_tridiagonal_staged(
    d, e, config=SolverConfig(), compute_vectors=True)
say(f"staged solve (spike on) in {time.time() - t0:.1f}s; "
    f"phases {dict(timer.times)}")
lam2 = np.asarray(res.eigenvalues)
V2 = res.eigenvectors
r2 = np.asarray(residuals(dj, ej, jnp.asarray(lam2), V2))
Vn = np.asarray(V2)
ortho = np.abs(Vn.T @ Vn - np.eye(n)).max()
say(f"FULL SOLVE residual max {r2.max() / snorm:.3e} *||T||, "
    f"orthogonality {ortho:.3e} "
    f"{'OK' if r2.max() / snorm < 1e-12 and ortho < 1e-9 else '*** BAD ***'}")
