#!/usr/bin/env python
"""Flagship evidence run: n=65536 FULL eigenpairs on ONE v5e chip, streamed.

The full eigenvector basis is 65536^2 * 8 B = 34 GB — more than double the
chip's HBM — so no holding-everything route exists single-chip (BASELINE.md
states the flagship for a v5e-8 pod; PARITY.md carries the sharded budget).
What CAN be measured on one chip, converting the flagship from paper budget
to artifact (round-4 verdict item 8): eigenvalues once, then eigenvector
columns streamed in fixed-width GROUPS — each group downswept, refined,
self-checked on device, and released — the same per-column math as the
resident path.

Boundary clusters: every group window carries a HALO of columns on each
side and only its central GROUP columns are "owned".  A near-degenerate
cluster that straddles an owned boundary is then INTERIOR to both
neighboring windows: both run the identical cluster-orthonormalization on
the identical column set (same executable, same data -> deterministic same
result), so the owned halves stay mutually orthogonal.  That property is
not assumed — it is measured: the adjacent-group cross-Gram is part of the
artifact, along with each group's full internal Gram, a random global
column sample re-checked at the end, and the reference's own per-column
residual ||T v - lam v|| (filehandling.c:511-537) for EVERY owned column.

Ref analog: the reference streams eigenvectors to disk one at a time in
writeResults (filehandling.c:369-507) for the same never-hold-everything
reason.

Usage: PYTHONPATH=.:/root/.axon_site python tools/run_n65536_full.py \
           [n] [group] [halo]
Writes N<d>_FULL.json.
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
GROUP = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
HALO = int(sys.argv[3]) if len(sys.argv) > 3 else 256
SEED = int(os.environ.get("BENCH_SEED", "0"))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(_HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from symmetric_eigenvalue_tpu import SolverConfig  # noqa: E402
from symmetric_eigenvalue_tpu import driver  # noqa: E402
from symmetric_eigenvalue_tpu.utils.checks import (  # noqa: E402
    max_cross_ortho_error, max_ortho_error)


def main():
    print(f"run_full n={N} platform={jax.default_backend()} "
          f"group={GROUP} halo={HALO}", flush=True)
    rng = np.random.default_rng(SEED)
    d_np = rng.standard_normal(N) * 5.0
    e_np = rng.standard_normal(N - 1) * 2.0
    cfg = SolverConfig()

    t_all = time.perf_counter()
    lam, blocks, timer = driver.solve_tridiagonal_streamed(
        d_np, e_np, config=cfg, group=GROUP, halo=HALO)
    lam_host = np.asarray(lam)
    t_eig = timer.times["eigenvalues"]
    print(f"eigenvalues: {t_eig:.2f}s (lam[0]={lam_host[0]:.6g})", flush=True)

    norm_t = float(np.abs(d_np).max() + 2 * np.abs(e_np).max())
    res_max = 0.0
    ortho_max = 0.0
    cross_max = 0.0
    sample_cols = []
    n_groups = (N + GROUP - 1) // GROUP
    V_prev_owned = None
    chunk = max(1, min(cfg.vec_chunk, cfg.resolved_refine_chunk(N)))
    d = jnp.asarray(d_np)
    e = jnp.asarray(e_np)
    for a, Vo in blocks:
        w = int(Vo.shape[1])
        tg = time.perf_counter()
        # measured residuals for EVERY owned column (one dispatch)
        res_g = np.asarray(driver._compiled_residuals(N, w, min(chunk, w))(
            d, e, jnp.asarray(lam_host[a:a + w]), Vo))
        og = max_ortho_error(Vo)
        cg = 0.0
        if V_prev_owned is not None:
            cg = max_cross_ortho_error(V_prev_owned, Vo)
        take = np.sort(rng.choice(w, size=min(8, w), replace=False))
        sample_cols.append(np.asarray(Vo[:, jnp.asarray(take)]))
        res_max = max(res_max, float(res_g.max()))
        ortho_max = max(ortho_max, og)
        cross_max = max(cross_max, cg)
        V_prev_owned = Vo
        print(f"  group [{a}:{a + w}] checks {time.perf_counter() - tg:6.1f}s"
              f" res={res_g.max():.2e} ortho={og:.2e} cross={cg:.2e}",
              flush=True)
    t_bt = timer.times["backtransformation_streamed"]
    del V_prev_owned

    # global sampled orthogonality across ALL groups
    Vs = jnp.asarray(np.concatenate(sample_cols, axis=1))
    ortho_sample = max_ortho_error(Vs)
    wall = time.perf_counter() - t_all

    out = {
        "metric": f"wallclock_full_eigenpairs_n{N}_streamed",
        "n": N, "group": GROUP, "halo": HALO, "num_groups": n_groups,
        "backend": jax.default_backend(),
        "value": round(t_eig + t_bt, 2), "unit": "s",
        "wall_total_s": round(wall, 2),
        "phases_s": {"eigenvalues": round(t_eig, 2),
                     "backtransformation_streamed": round(t_bt, 2)},
        "max_residual_over_normT": float(f"{res_max / norm_t:.3e}"),
        "residual_target_met": bool(res_max / norm_t <= 1e-12),
        "max_orthogonality_error_within_group": float(f"{ortho_max:.3e}"),
        "max_orthogonality_error_adjacent_groups": float(f"{cross_max:.3e}"),
        "max_orthogonality_error_global_sample":
            float(f"{ortho_sample:.3e}"),
        "sample_columns": int(Vs.shape[1]),
        "note": ("full basis exceeds resident HBM budget: vectors streamed "
                 "per fixed-width halo'd group "
                 "(driver.solve_tridiagonal_streamed); every column's "
                 "residual measured on device"),
    }
    path = os.path.join(_HERE, f"N{N}_FULL.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
