#!/usr/bin/env python
"""Dense symmetric eigensolve at scale on TPU -> DENSE_EIGH.json artifact.

Runs ``driver.eigh`` (Householder front-end + staged Cuppen solve +
compact-WY backtransformation) on a random dense symmetric matrix and
records wall time plus reference-style self-checks (residual against the
ORIGINAL dense A, filehandling.c:511-537 semantics; mutual orthogonality).
The reference has no dense path at all — this is BASELINE.md north-star
completeness evidence.

Usage: PYTHONPATH=.:/root/.axon_site python tools/run_dense_eigh.py [n] [reps]
Env:   DENSE_EIGVALS_ONLY=1  DENSE_BASELINE=1 (host numpy eigh; slow)
       DENSE_BAND=128  (two-stage SBR front-end: dense -> band -> tridiag
       by wavefront chasing + compact-WY Q2; 0 = one-stage Householder)
"""

import json
import os
import sys
import time

_CHECK_MODE = len(sys.argv) > 1 and sys.argv[1] == "--check"
N = int(sys.argv[1]) if len(sys.argv) > 1 and not _CHECK_MODE else 16384
REPS = int(sys.argv[2]) if len(sys.argv) > 2 and not _CHECK_MODE else 1
EIGVALS_ONLY = os.environ.get("DENSE_EIGVALS_ONLY", "0") == "1"
HOST_BASELINE = os.environ.get("DENSE_BASELINE", "0") == "1"
BAND = int(os.environ.get("DENSE_BAND", "0"))

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(_HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, _HERE)
from symmetric_eigenvalue_tpu import SolverConfig  # noqa: E402
from symmetric_eigenvalue_tpu.driver import eigh  # noqa: E402
from symmetric_eigenvalue_tpu.utils.checks import max_ortho_error  # noqa: E402


def dense_residual(A, lam, V, col_chunk=2048, row_chunk=4096):
    """max_i ||A v_i - lam_i v_i||_inf, f64-grade, row- AND column-blocked.

    Uses the double-word GEMM on TPU (XLA emulated-f64 n^3 dot would take
    ~90 s at n=16384 and the f32-HIGHEST expansion OOMs; see utils/checks).
    Row-blocking bounds the kernel's f32-pair expansion of the A operand:
    with A (2.1 GB) and V (2.1 GB) both live at n=16384, pair temporaries of
    the FULL A pushed the check over the 16 GB HBM (observed ResourceExhausted
    after an otherwise-successful solve)."""
    n = A.shape[0]
    col_chunk = min(col_chunk, n)
    row_chunk = min(row_chunk, n)
    use_dword = jax.default_backend() == "tpu"

    def chunk_err(A, V, lam, r0, c0):
        Ar = jax.lax.dynamic_slice_in_dim(A, r0, row_chunk, axis=0)
        Vc = jax.lax.dynamic_slice_in_dim(V, c0, col_chunk, axis=1)
        lc = jax.lax.dynamic_slice_in_dim(lam, c0, col_chunk)
        if use_dword:
            from symmetric_eigenvalue_tpu.kernels.pallas.dword_matmul import (
                dword_matmul)
            AV = dword_matmul(Ar, Vc)
        else:
            AV = Ar @ Vc
        Vrc = jax.lax.dynamic_slice_in_dim(Vc, r0, row_chunk, axis=0)
        return jnp.max(jnp.abs(AV - Vrc * lc[None, :]))

    fn = jax.jit(chunk_err)
    worst = 0.0
    for c0 in range(0, n, col_chunk):
        c0 = min(c0, n - col_chunk)
        for r0 in range(0, n, row_chunk):
            r0 = min(r0, n - row_chunk)
            worst = max(worst, float(fn(A, V, lam, r0, c0)))
    return worst


def _make_a(n):
    # generate A ON DEVICE: a 2 GB host->device f64 transfer through the
    # tunneled platform takes many minutes, the jitted PRNG milliseconds
    @jax.jit
    def make_a(key):
        G = jax.random.normal(key, (n, n), dtype=jnp.float64)
        # O(1)-scaled entries (the dword kernels' documented precondition)
        return (G + G.T) / (2.0 * np.sqrt(n))
    return make_a


def check_main(lam_path, v_path, n, metric):
    """Fresh-process checker: the full residual/ortho self-checks OOM'd
    in the solver process at n=16384 even at the smallest chunking (queue7)
    — post-solve HBM fragmentation; a clean process holds only A+V+lam
    (~4.3 GB on a 16 GB chip).  Regenerates A (same PRNGKey(0) recipe),
    loads the persisted eigenpairs, merges check fields into DENSE_EIGH."""
    print(f"check_main: n={n} metric={metric}", flush=True)
    make_a = _make_a(n)
    Adev = make_a(jax.random.PRNGKey(0))
    norm_a = float(jax.jit(
        lambda A: jnp.max(jnp.sum(jnp.abs(A), axis=1)))(Adev))
    lam = jnp.asarray(np.load(lam_path))
    t0 = time.perf_counter()
    V = jnp.asarray(np.load(v_path))   # 2.1 GB upload: slow but bounded
    jax.block_until_ready(V)
    print(f"  V upload: {time.perf_counter()-t0:.1f}s", flush=True)
    result = {"metric": metric, "checked_in_fresh_process": True}
    t0 = time.perf_counter()
    resid = orth = None
    for cc, rc in [(2048, 4096), (1024, 2048), (512, 1024)]:
        try:
            resid = dense_residual(Adev, lam, V, col_chunk=cc, row_chunk=rc)
            break
        except Exception as exc:   # noqa: BLE001 — record, shrink, retry
            print(f"  residual check failed at chunks ({cc},{rc}): "
                  f"{type(exc).__name__}: {exc}", flush=True)
            result["residual_check_error"] = f"{type(exc).__name__}"
            jax.clear_caches()
    try:
        orth = max_ortho_error(V)
    except Exception as exc:       # noqa: BLE001
        print(f"  ortho check failed: {type(exc).__name__}: {exc}",
              flush=True)
        result["ortho_check_error"] = f"{type(exc).__name__}"
    if resid is not None:
        result.pop("residual_check_error", None)
        result["max_residual"] = float(f"{resid:.3e}")
        result["max_residual_over_normA"] = float(f"{resid / norm_a:.3e}")
        result["residual_target_met"] = bool(resid <= 1e-12 * norm_a)
    if orth is not None:
        result["max_orthogonality_error"] = float(f"{orth:.3e}")
    result["check_s"] = round(time.perf_counter() - t0, 1)
    print(f"  residual {resid} (/||A|| "
          f"{resid / norm_a if resid is not None else None}) orth {orth}",
          flush=True)
    _merge(metric, result)
    print(json.dumps(result), flush=True)


def main():
    print(f"run_dense_eigh: n={N} platform={jax.devices()[0].platform} "
          f"eigvals_only={EIGVALS_ONLY}", flush=True)
    make_a = _make_a(N)

    Adev = make_a(jax.random.PRNGKey(0))
    norm_a = float(jax.jit(
        lambda A: jnp.max(jnp.sum(jnp.abs(A), axis=1)))(Adev))
    tr = float(jax.jit(lambda A: jnp.sum(jnp.diag(A)))(Adev))
    cfg = SolverConfig()
    A = None   # host copy only materialized for the optional baseline
    times = []
    for r in range(max(REPS, 1)):
        if r > 0:
            # the staged two-stage route donates A; regenerate (jitted PRNG,
            # milliseconds) so later runs / the residual check have it
            Adev = make_a(jax.random.PRNGKey(0))
        t0 = time.perf_counter()
        out = eigh(Adev, config=cfg, eigvals_only=EIGVALS_ONLY, band=BAND)
        lam = out if EIGVALS_ONLY else out[0]
        V = None if EIGVALS_ONLY else out[1]
        jax.block_until_ready(lam)
        if V is not None:
            jax.block_until_ready(V)
        # tunneled platform: block_until_ready does not block; force a fetch
        _ = float(np.asarray(lam[:1])[0])
        times.append(time.perf_counter() - t0)
        print(f"  run {r}: {times[-1]:.1f}s", flush=True)

    result = {
        "metric": (("wallclock_dense_eigvals_n%d" % N if EIGVALS_ONLY
                    else "wallclock_dense_eigenpairs_n%d" % N)
                   + ("_band%d" % BAND if BAND else "")),
        "value": round(min(times), 2),
        "unit": "s",
        "first_run_s": round(times[0], 2),
        "backend": jax.default_backend(),
        "band": BAND,
        "norm_a": norm_a,
    }

    if EIGVALS_ONLY or V is not None:
        lam_np = np.asarray(lam)
        result["lam_range"] = [float(lam_np[0]), float(lam_np[-1])]
        # O(n) trace self-check, immune to the OOM class that can kill the
        # O(n^2)-memory checks below: sum(lam) = trace(A) exactly in exact
        # arithmetic; backward-stable solves keep it to ~n*u*||A||-grade
        terr = abs(lam_np.sum() - tr) / max(norm_a * N, 1e-300)
        result["trace_error_over_n_normA"] = float(f"{terr:.3e}")
        result["trace_check_met"] = bool(terr <= 1e-13)
    # persist the timing measurement BEFORE the self-checks: a check-side
    # ResourceExhausted cost queue5 the whole n=16384 artifact (the 479.8 s
    # solve succeeded, nothing was written)
    _write(result)
    if V is not None:
        # drop the solver executables before the checks: the staged dense
        # route holds donated 2.1 GB in/out aliases in its cached jits and
        # the check OOM'd at n=16384 with A+V live on a 16 GB chip
        jax.clear_caches()
        t0 = time.perf_counter()
        Adev = make_a(jax.random.PRNGKey(0))   # may have been donated
        resid = orth = None
        for attempt, (cc, rc) in enumerate(
                [(2048, 4096), (1024, 2048), (512, 1024)]):
            try:
                resid = dense_residual(Adev, lam, V,
                                       col_chunk=cc, row_chunk=rc)
                break
            except Exception as exc:   # noqa: BLE001 — record, shrink, retry
                print(f"  residual check failed at chunks ({cc},{rc}): "
                      f"{type(exc).__name__}: {exc}", flush=True)
                result["residual_check_error"] = f"{type(exc).__name__}"
                jax.clear_caches()
        try:
            orth = max_ortho_error(V)
        except Exception as exc:       # noqa: BLE001
            print(f"  ortho check failed: {type(exc).__name__}: {exc}",
                  flush=True)
            result["ortho_check_error"] = f"{type(exc).__name__}"
        if resid is not None:
            result.pop("residual_check_error", None)
            result["max_residual"] = float(f"{resid:.3e}")
            result["max_residual_over_normA"] = float(f"{resid / norm_a:.3e}")
            result["residual_target_met"] = bool(resid <= 1e-12 * norm_a)
        if orth is not None:
            result["max_orthogonality_error"] = float(f"{orth:.3e}")
        result["check_s"] = round(time.perf_counter() - t0, 1)
        print(f"  residual {resid} (/||A|| "
              f"{resid / norm_a if resid is not None else None}) "
              f"orth {orth}", flush=True)
        if resid is None or orth is None:
            # post-solve HBM fragmentation can OOM even the 512-col chunk
            # (observed queue7 n=16384): persist the eigenpairs and re-run
            # the checks in a FRESH process with a clean heap
            import subprocess
            lam_path = "/tmp/dense_eigh_lam.npy"
            v_path = "/tmp/dense_eigh_V.npy"
            t0 = time.perf_counter()
            np.save(lam_path, np.asarray(lam))
            # fetch V in COLUMN CHUNKS: a whole-array fetch stages a full
            # device copy on the tunneled platform, and with HBM already
            # fragmented post-OOM even that staging RESOURCE_EXHAUSTS
            # (round-5 q2c died exactly here)
            V_np = np.empty(V.shape, np.asarray(lam).dtype)
            step = 2048
            for o in range(0, V.shape[1], step):
                w = min(step, V.shape[1] - o)
                V_np[:, o:o + w] = np.asarray(
                    jax.lax.dynamic_slice_in_dim(V, o, w, axis=1))
            np.save(v_path, V_np)
            del V_np
            print(f"  persisted eigenpairs in {time.perf_counter()-t0:.1f}s;"
                  " spawning fresh-process checker", flush=True)
            _write(result)
            metric = result["metric"]
            # Actually free the device: the checker child shares the
            # single-tenant chip, so the parent must drop its ~4.3 GB of live
            # buffers (Adev/V/lam) AND its cached executables before the
            # child initializes, or the child inherits the same fragmented
            # HBM the fresh process exists to escape (ADVICE r3).
            del Adev, V, lam, out
            jax.clear_caches()
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--check",
                 lam_path, v_path, str(N), metric],
                env=dict(os.environ)).returncode
            print(f"  fresh-process checker rc={rc}", flush=True)
            for p in (lam_path, v_path):
                try:
                    os.remove(p)
                except OSError:
                    pass
            try:
                with open(os.path.join(_HERE, "DENSE_EIGH.json")) as f:
                    result = json.load(f)[metric]
            except Exception:   # noqa: BLE001 — checker crashed mid-write
                pass            # keep the solver-recorded result dict
            print(json.dumps(result), flush=True)
            V = None   # checks are done; fall through for HOST_BASELINE

    if HOST_BASELINE:
        try:
            A = np.asarray(Adev)
        except NameError:   # freed before the fresh-process checker
            A = np.asarray(make_a(jax.random.PRNGKey(0)))
        t0 = time.perf_counter()
        if EIGVALS_ONLY:
            np.linalg.eigvalsh(A)
        else:
            np.linalg.eigh(A)
        result["host_numpy_s"] = round(time.perf_counter() - t0, 1)
        result["vs_host_numpy"] = round(result["host_numpy_s"] /
                                        result["value"], 2)

    _write(result)
    print(json.dumps(result), flush=True)


def _write(result):
    path = os.path.join(_HERE, "DENSE_EIGH.json")
    existing = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                existing = json.load(f)
        except Exception:
            existing = {}
    existing[result["metric"]] = result
    with open(path, "w") as f:
        json.dump(existing, f, indent=1)


def _merge(metric, fields):
    """Merge check fields into an existing artifact entry (fresh-process
    checker must not clobber the solver-recorded timing)."""
    path = os.path.join(_HERE, "DENSE_EIGH.json")
    existing = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                existing = json.load(f)
        except Exception:
            existing = {}
    entry = existing.setdefault(metric, {})
    for k in ("residual_check_error", "ortho_check_error"):
        entry.pop(k, None)
    entry.update(fields)
    with open(path, "w") as f:
        json.dump(existing, f, indent=1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--check":
        check_main(sys.argv[2], sys.argv[3], int(sys.argv[4]), sys.argv[5])
    else:
        main()
