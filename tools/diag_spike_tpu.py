"""On-TPU diagnosis of the Spike refinement kernel at headline configs.

The 21:04 hardware check validated spike_refine at n=4096/K=2048/nb=128
(single chunk, P=32); the n=16384 headline bench then recorded garbage
eigenvectors (residual 0.15*||T||, orthogonality 0.41) with the spike pass
in the loop.  Interpret mode passes at every production-like shape, so this
script bisects the HARDWARE configs the validated check did not cover:
P=128 row blocks, multi-chunk column sweeps, and the nb=96 alternate pass.

Stage 1: isolated solver, spike vs refine.solve_shifted_tridiagonal_blocked
on identical well-conditioned inputs (shifts clear of the spectrum): outputs
must agree to ~1e-11.  Stage 2: production integration — refine an
already-converged eigenvector block and verify it stays converged.

Run under the device lock: flock /tmp/tpu_device.lock python tools/diag_spike_tpu.py
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

from symmetric_eigenvalue_tpu.kernels import refine
from symmetric_eigenvalue_tpu.kernels.pallas import spike_solve


def say(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


@jax.jit
def _coldots(A, B):
    return jnp.sum(A * B, axis=0)


def residuals(d, e, lam, X):
    """Per-column ||T x - lam x|| in f64 on device."""
    # tridiagonal matvec, columnwise
    Tx = d[:, None] * X
    Tx = Tx.at[:-1].add(e[:, None] * X[1:])
    Tx = Tx.at[1:].add(e[:, None] * X[:-1])
    R = Tx - X * lam[None, :]
    return jnp.linalg.norm(R, axis=0)


def stage1(n, K, nb, chunk, seed=0):
    rng = np.random.default_rng(seed)
    d = jnp.asarray(rng.standard_normal(n))
    e = jnp.asarray(rng.standard_normal(n - 1) * 0.5)
    # shifts clear of the spectrum edge: |lam| > ||T|| keeps (T - lam) well
    # conditioned, so spike and the XLA solver must agree tightly
    scale = float(jnp.max(jnp.abs(d)) + 2 * jnp.max(jnp.abs(e)))
    lam = jnp.asarray(np.linspace(1.5, 3.0, K) * scale)
    B = rng.standard_normal((n, K))
    B /= np.linalg.norm(B, axis=0, keepdims=True)
    B = jnp.asarray(B)

    # XLA solver first: the spike path donates B
    Xr = np.asarray(refine.solve_shifted_tridiagonal_blocked(d, e, lam, B,
                                                             nb=nb))
    X = spike_solve.solve_shifted_tridiagonal_spike(d, e, lam, B, nb=nb)
    X = np.asarray(X)
    err = np.max(np.abs(X - Xr)) / max(np.max(np.abs(Xr)), 1e-30)
    ok = err < 1e-10
    say(f"stage1 n={n} K={K} nb={nb}: max|spike-xla|/scale = {err:.3e} "
        f"{'OK' if ok else '*** MISMATCH ***'}")
    if not ok:
        # localize: which columns / rows
        colerr = np.max(np.abs(X - Xr), axis=0) / max(np.max(np.abs(Xr)),
                                                      1e-30)
        badc = np.nonzero(colerr > 1e-10)[0]
        say(f"  bad columns: {badc.size}/{K}; first 12: {badc[:12].tolist()}")
        if badc.size:
            c = int(badc[0])
            rowerr = np.abs(X[:, c] - Xr[:, c])
            badr = np.nonzero(rowerr > 1e-10 * np.max(np.abs(Xr)))[0]
            say(f"  col {c}: bad rows {badr.size}/{n}, first/last: "
                f"{badr[:6].tolist()} ... {badr[-6:].tolist()}")
    return ok


def stage2(n, seed=0):
    """Production integration: solve with the XLA refine path (known good),
    then run ONE spike pass on the converged block — it must stay converged."""
    from symmetric_eigenvalue_tpu import SolverConfig
    from symmetric_eigenvalue_tpu.driver import solve_tridiagonal_staged
    rng = np.random.default_rng(seed)
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    cfg = SolverConfig(mixed_precision_vectors=True, use_pallas_refine=False)
    t0 = time.time()
    res, _ = solve_tridiagonal_staged(d, e, config=cfg, compute_vectors=True)
    say(f"stage2 n={n}: XLA-refine solve done in {time.time() - t0:.1f}s")
    lam, V = res.eigenvalues, res.eigenvectors
    dj = jnp.asarray(d)
    ej = jnp.asarray(e)
    snorm = float(jnp.max(jnp.abs(dj)) + 2 * jnp.max(jnp.abs(ej)))
    r0 = np.asarray(residuals(dj, ej, lam, V))
    say(f"  reference residual max = {r0.max() / snorm:.3e} *||T||")
    ds, es, lams = dj / snorm, ej / snorm, lam / snorm
    for nb, chunk, tag in ((128, 2048, "pass1 config"),
                           (96, 2048, "alt config")):
        # spike_refine donates the vector block: hand it a copy
        X, rest = spike_solve.spike_refine(ds, es, lams, V.copy(), nb=nb,
                                           chunk=chunk)
        r1 = np.asarray(residuals(dj, ej, lam, X.astype(jnp.float64)))
        ortho = float(np.max(np.abs(
            np.asarray(X[:, ::257]).T @ np.asarray(X[:, ::257])
            - np.eye(len(range(0, n, 257))))))
        say(f"  spike nb={nb} chunk={chunk} ({tag}): residual max "
            f"{r1.max() / snorm:.3e} *||T||, sampled ortho {ortho:.3e} "
            f"{'OK' if r1.max() / snorm < 1e-10 else '*** BROKEN ***'}")


if __name__ == "__main__":
    say(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    # increasing risk order; flush between in case a config wedges the device
    ok_a = stage1(4096, 2048, 128, 2048)       # control (validated config)
    ok_d = stage1(4096, 1024, 96, 2048)        # nb=96 on HW
    ok_b = stage1(16384, 2048, 128, 2048)      # P=128 on HW
    ok_c = stage1(16384, 4096, 128, 2048)      # multi-chunk on HW
    if ok_a and ok_b and ok_c and ok_d:
        say("stage1 all OK -> integration test")
        stage2(16384)
    say("diag done")
