#!/usr/bin/env python
"""n=8192 column-sharded downsweep + refinement over the virtual 8-device CPU
mesh — the largest practical stand-in for the v5e-8 n=65536 flagship
(VERDICT r2 item 7).

Runs the SHIPPING pipeline (``solve_tridiagonal_staged`` with mixed-precision
vectors: f32 column-sharded stepped downsweep + f64 inverse-iteration
refinement) over an 8-device mesh, asserts the reference-style self-checks
(residual against T, filehandling.c:513-531; plus mutual orthogonality), and
records a machine-readable artifact at MESH_EVIDENCE.json.

Usage:  JAX_PLATFORMS=cpu python tools/mesh_scale_evidence.py  [n] [devices]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_ENABLE_X64", "1")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
NDEV = int(sys.argv[2]) if len(sys.argv) > 2 else 8

if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count={NDEV}")
# XLA:CPU's in-process collective rendezvous aborts the process when the
# participants' arrivals spread more than 40 s apart (rendezvous.cc
# terminate timeout).  On a single-core host the 8 virtual devices run
# their pre-collective compute SEQUENTIALLY, so at n=8192 the spread is
# minutes by construction — raise the hard limit (and quiet the 20 s
# warning) rather than capping the problem size.
os.environ["XLA_FLAGS"] += (
    " --xla_cpu_collective_timeout_seconds=7200"
    " --xla_cpu_collective_call_terminate_timeout_seconds=7200")
if "parallel_codegen" not in os.environ["XLA_FLAGS"]:
    # XLA:CPU's parallel LLVM codegen (default split 32) THRASHES on a
    # 1-core host: 8+ spinning compile threads, ~97% kernel time, the
    # n=8192 compile made no progress in an hour.  Single-threaded codegen
    # runs at full speed.
    os.environ["XLA_FLAGS"] += " --xla_cpu_parallel_codegen_split_count=1"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
# persistent compile cache: same-machine reuse only (XLA:CPU AOT entries embed
# host CPU features), which is exactly the tool's usage pattern
_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(_HERE, ".jax_cache"))

import numpy as np  # noqa: E402

from symmetric_eigenvalue_tpu import SolverConfig  # noqa: E402
from symmetric_eigenvalue_tpu.dist.mesh import make_mesh  # noqa: E402
from symmetric_eigenvalue_tpu.driver import solve_tridiagonal_staged  # noqa: E402


def main():
    print(f"mesh_scale_evidence: n={N} devices={NDEV} "
          f"platform={jax.devices()[0].platform}", flush=True)
    mesh = make_mesh(NDEV)
    # leaf 64 bounds the CPU compile (7 tree levels at n=8192); vec_chunk
    # n//4 exercises the column-chunked downsweep path the flagship uses
    config = SolverConfig(leaf_size=64, vec_chunk=max(N // 4, 256),
                          mixed_precision_vectors=True)
    rng = np.random.default_rng(0)
    d = rng.standard_normal(N) * 3.0
    e = rng.standard_normal(N - 1)

    t0 = time.perf_counter()
    res, timer = solve_tridiagonal_staged(d, e, config=config,
                                          compute_vectors=True, mesh=mesh)
    wall = time.perf_counter() - t0
    print(f"solve done in {wall:.1f}s — running self-checks", flush=True)
    lam = np.asarray(res.eigenvalues)
    V = np.asarray(res.eigenvectors)

    resid = np.abs(d[:, None] * V
                   + np.vstack([e[:, None] * V[1:], np.zeros((1, N))])
                   + np.vstack([np.zeros((1, N)), e[:, None] * V[:-1]])
                   - V * lam[None, :]).max()
    scale = max(np.abs(lam).max(), 1.0)
    orth = np.abs(V.T @ V - np.eye(N)).max()
    ok = bool(resid < 1e-12 * scale and orth < 1e-10)
    out = {
        "n": N,
        "devices": NDEV,
        "platform": jax.devices()[0].platform,
        "pipeline": "solve_tridiagonal_staged mixed (f32 column-sharded "
                    "stepped downsweep + f64 refinement)",
        "wall_s": round(wall, 1),
        "phases_s": {k: round(v, 2) for k, v in timer.times.items()},
        "max_residual_over_normT": float(f"{resid / scale:.3e}"),
        "max_orthogonality_error": float(f"{orth:.3e}"),
        "ok": ok,
    }
    path = os.path.join(_HERE, "MESH_EVIDENCE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    assert ok, "self-checks failed"
    print("mesh_scale_evidence: OK", flush=True)


if __name__ == "__main__":
    main()
