"""Poisson n=16384 regression diagnosis: spike path vs XLA refine path.

The post-fix Poisson bench records residual 2.06e-12*||T|| (target 1e-12,
previously 5.0e-13 on the XLA path) and ortho 4.2e-9 (was 6e-11).  Compare
both refine paths on the same matrix, localize offending columns, and print
their gap/segment context.
"""
import os
import sys
import time

os.environ.setdefault("JAX_ENABLE_X64", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from symmetric_eigenvalue_tpu import SolverConfig
from symmetric_eigenvalue_tpu.driver import solve_tridiagonal_staged


def say(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def residuals_chunked(d, e, lam, V, chunk=2048):
    @jax.jit
    def res_c(d, e, lam_c, X):
        Tx = d[:, None] * X
        Tx = Tx.at[:-1].add(e[:, None] * X[1:])
        Tx = Tx.at[1:].add(e[:, None] * X[:-1])
        return jnp.linalg.norm(Tx - X * lam_c[None, :], axis=0)
    out = []
    for o in range(0, lam.shape[0], chunk):
        out.append(res_c(d, e, lam[o:o + chunk], V[:, o:o + chunk]))
    return np.asarray(jnp.concatenate(out))


n = 16384
d = np.full(n, 2.0)
e = np.full(n - 1, -1.0)
dj, ej = jnp.asarray(d), jnp.asarray(e)
snorm = 4.0

report = {}
for tag, use_spike in (("spike", True), ("xla", False)):
    cfg = SolverConfig(use_pallas_refine=use_spike)
    t0 = time.time()
    res, timer = solve_tridiagonal_staged(d, e, config=cfg,
                                          compute_vectors=True)
    lam = np.asarray(res.eigenvalues)
    V = res.eigenvectors
    r = residuals_chunked(dj, ej, jnp.asarray(lam), V)
    Vn = np.asarray(V)
    G = Vn.T @ Vn - np.eye(n)
    ortho = np.abs(G).max()
    say(f"{tag}: wall {time.time()-t0:.1f}s (phases {dict(timer.times)}) "
        f"residual {r.max()/snorm:.3e}*||T|| ortho {ortho:.3e}")
    bad = np.nonzero(r > 1e-12 * snorm)[0]
    say(f"  {bad.size} columns above 1e-12*||T||")
    gaps = np.diff(lam)
    order = np.argsort(-r)
    for i in order[:10]:
        gl = gaps[i - 1] if i > 0 else np.inf
        gr = gaps[i] if i < n - 1 else np.inf
        # worst ortho partner
        j = int(np.argmax(np.abs(G[i])))
        say(f"    col {i:6d} res {r[i]/snorm:9.2e} lam {lam[i]:+.9e} "
            f"gapL {gl:8.1e} gapR {gr:8.1e} worst-G[{j}] {G[i, j]:9.2e}")
    report[tag] = (r, ortho)
    del V, Vn, G
say("diag done")
