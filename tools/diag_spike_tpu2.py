"""Localize the spike_refine hardware failure: which columns break, and do
they break in a single-tile rerun / with normalization off / in the XLA
solver on identical inputs?"""
import os
import sys
import time

os.environ.setdefault("JAX_ENABLE_X64", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from symmetric_eigenvalue_tpu.kernels import refine
from symmetric_eigenvalue_tpu.kernels.pallas import spike_solve


def say(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def residuals(d, e, lam, X):
    Tx = d[:, None] * X
    Tx = Tx.at[:-1].add(e[:, None] * X[1:])
    Tx = Tx.at[1:].add(e[:, None] * X[:-1])
    return jnp.linalg.norm(Tx - X * lam[None, :], axis=0)


CACHE = "/tmp/diag_ref_16384.npz"


def get_reference(n=16384, seed=0):
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        say("loaded cached reference solve")
        return z["d"], z["e"], z["lam"], z["V"]
    from symmetric_eigenvalue_tpu import SolverConfig
    from symmetric_eigenvalue_tpu.driver import solve_tridiagonal_staged
    rng = np.random.default_rng(seed)
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    cfg = SolverConfig(mixed_precision_vectors=True, use_pallas_refine=False)
    t0 = time.time()
    res, _ = solve_tridiagonal_staged(d, e, config=cfg, compute_vectors=True)
    say(f"reference solve in {time.time() - t0:.1f}s")
    lam = np.asarray(res.eigenvalues)
    V = np.asarray(res.eigenvectors)
    np.savez(CACHE, d=d, e=e, lam=lam, V=V)
    return d, e, lam, V


d, e, lam, V = get_reference()
n = d.shape[0]
dj, ej = jnp.asarray(d), jnp.asarray(e)
lamj, Vj = jnp.asarray(lam), jnp.asarray(V)
snorm = float(jnp.max(jnp.abs(dj)) + 2 * jnp.max(jnp.abs(ej)))
ds, es, lams = dj / snorm, ej / snorm, lamj / snorm

r0 = np.asarray(residuals(dj, ej, lamj, Vj))
say(f"reference residuals: max {r0.max() / snorm:.3e} *||T||")

X, rest = spike_solve.spike_refine(ds, es, lams, Vj.copy(), nb=128,
                                   chunk=2048)
X64 = X.astype(jnp.float64)
r1 = np.asarray(residuals(dj, ej, lamj, X64))
rest = np.asarray(rest)
bad = np.nonzero(r1 > 1e-10 * snorm)[0]
say(f"spike pass: {bad.size} bad columns of {n}; worst {r1.max()/snorm:.3e}")
order = np.argsort(-r1)
say("worst 20 columns (idx, res/||T||, spike-own-est, lam, gapL, gapR):")
gaps = np.diff(lam)
for i in order[:20]:
    gl = gaps[i - 1] if i > 0 else np.inf
    gr = gaps[i] if i < n - 1 else np.inf
    say(f"  {i:6d} {r1[i]/snorm:9.2e} {rest[i]:9.2e} {lam[i]:+.6e} "
        f"{gl:9.2e} {gr:9.2e}")
# chunk distribution of bad columns
if bad.size:
    hist = np.bincount(bad // 2048, minlength=8)
    say(f"bad-column count per 2048-chunk: {hist.tolist()}")
    tilehist = np.bincount((bad % 2048) // 1024, minlength=2)
    say(f"bad-column count per 1024-tile within chunk: {tilehist.tolist()}")
    pos = bad % 1024
    say(f"within-tile positions of first 30 bad: {np.sort(pos)[:30].tolist()}")

    # single-tile rerun on a 1024 window containing the worst column
    c = int(order[0])
    o = (c // 1024) * 1024
    sel = slice(o, o + 1024)
    Xs, rs = spike_solve.spike_refine(ds, es, lams[sel], Vj[:, sel].copy(),
                                      nb=128, chunk=2048)
    r2 = np.asarray(residuals(dj, ej, lamj[sel], Xs.astype(jnp.float64)))
    say(f"single-tile rerun cols [{o},{o+1024}): worst col now "
        f"{r2[c - o]/snorm:.3e}, tile max {r2.max()/snorm:.3e}")

    # unnormalized spike vs XLA on the same window
    Xu = spike_solve.solve_shifted_tridiagonal_spike(
        ds, es, lams[sel], Vj[:, sel].copy(), nb=128)
    Xr = refine.solve_shifted_tridiagonal_blocked(
        ds, es, lams[sel], Vj[:, sel], nb=128)
    Xu, Xr = np.asarray(Xu), np.asarray(Xr)
    j = c - o
    scale = max(np.abs(Xr[:, j]).max(), 1e-30)
    err = np.abs(Xu[:, j] - Xr[:, j]).max() / scale
    say(f"unnormalized col {c}: max|spike-xla|/scale = {err:.3e}, "
        f"|x|max spike {np.abs(Xu[:, j]).max():.3e} xla "
        f"{np.abs(Xr[:, j]).max():.3e}")
    # normalized directions
    un = Xu[:, j] / np.linalg.norm(Xu[:, j])
    rn = Xr[:, j] / np.linalg.norm(Xr[:, j])
    say(f"direction dot(spike, xla) = {abs(np.dot(un, rn)):.6f}")
    rxla = np.asarray(residuals(dj, ej, lamj[sel],
                                jnp.asarray(Xr / np.linalg.norm(Xr, axis=0,
                                                                keepdims=True))))
    say(f"XLA normalized residual at col {c}: {rxla[j]/snorm:.3e}, "
        f"window max {rxla.max()/snorm:.3e}")
say("diag2 done")
