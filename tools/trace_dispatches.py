#!/usr/bin/env python
"""Per-dispatch timeline trace of the staged/fused tridiagonal solve.

Round-4 verdict item 4 asked for a dispatch-count trace of the clustered
n=4096 config before optimizing it further: on the tunneled TPU every
executable launch costs ~16 ms of host time and every host fetch ~33 ms,
so the wall-clock floor of a phase is set by its dispatch/fetch COUNT, not
by device FLOPs.  This tool measures that count directly:

  * ``pjit._get_fastpath_data`` is patched to return ``None`` so every jit
    call takes the Python dispatch path (the C++ fastpath executes the
    PJRT executable from C++ where Python cannot observe it);
  * ``pxla.ExecuteReplicated.__call__`` is wrapped to log (host timestamp,
    executable name, host-blocking duration) per launch;
  * host fetches are visible as gaps between launches (plus the explicit
    ``utils.timing.sync`` log hook).

The first (compile) run is discarded; the second, warm run is traced and
summarized.  Output: TRACE_DISPATCH.json {config, wall_s, n_dispatch,
launches: [...]} + a stdout table.

Usage: PYTHONPATH=.:/root/.axon_site python tools/trace_dispatches.py \
           [n] [matrix]        # default 4096 clustered
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
MATRIX = sys.argv[2] if len(sys.argv) > 2 else "clustered"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(_HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402

from jax._src import pjit as _pjit  # noqa: E402
from jax._src.interpreters import pxla  # noqa: E402

from symmetric_eigenvalue_tpu import SolverConfig  # noqa: E402
from symmetric_eigenvalue_tpu.driver import solve_tridiagonal_staged  # noqa: E402
from symmetric_eigenvalue_tpu.utils.timing import PhaseTimer, sync  # noqa: E402

LOG = []
_T0 = [0.0]


def _install():
    _pjit._get_fastpath_data = lambda *a, **k: None
    orig = pxla.ExecuteReplicated.__call__

    def traced(self, *args):
        t0 = time.perf_counter()
        out = orig(self, *args)
        t1 = time.perf_counter()
        LOG.append({"t": round(t0 - _T0[0], 6),
                    "host_s": round(t1 - t0, 6),
                    "name": str(self.name)[:64]})
        return out

    pxla.ExecuteReplicated.__call__ = traced


def _matrix(n):
    """Same generators as bench.py::make_matrix (seed 0)."""
    rng = np.random.default_rng(0)
    if MATRIX == "clustered":
        centers = rng.standard_normal(max(n // 64, 1)) * 10
        d = np.repeat(centers, 64)[:n]
        d = d + 1e-9 * rng.standard_normal(n)
        e = 1e-7 * (1.0 + rng.random(n - 1))
        return d, e
    if MATRIX == "poisson":
        return 2.0 * np.ones(n), -np.ones(n - 1)
    return rng.standard_normal(n) * 5.0, rng.standard_normal(n - 1) * 2.0


def main():
    d, e = _matrix(N)
    d = np.asarray(d)
    e = np.asarray(e)
    cfg = SolverConfig()
    _install()

    # run 1: compile (discard)
    t0 = time.perf_counter()
    timer = PhaseTimer()
    lam, V = solve_tridiagonal_staged(d, e, config=cfg, compute_vectors=True,
                                      timer=timer)
    sync((lam, V))
    print(f"compile run done ({time.perf_counter() - t0:.1f}s, "
          f"{len(LOG)} launches incl. compile)", flush=True)

    LOG.clear()
    timer = PhaseTimer()
    _T0[0] = time.perf_counter()
    lam, V = solve_tridiagonal_staged(d, e, config=cfg, compute_vectors=True,
                                      timer=timer)
    sync((lam, V))
    wall = time.perf_counter() - _T0[0]

    print(f"\nwarm run: {wall:.4f}s wall, {len(LOG)} dispatches "
          f"(phases: { {k: round(v, 4) for k, v in timer.times.items()} })")
    print(f"{'t(ms)':>9} {'host(ms)':>9} {'gap(ms)':>8}  name")
    prev_end = 0.0
    for rec in LOG:
        gap = rec["t"] - prev_end
        print(f"{rec['t'] * 1e3:9.1f} {rec['host_s'] * 1e3:9.1f} "
              f"{gap * 1e3:8.1f}  {rec['name']}")
        prev_end = rec["t"] + rec["host_s"]
    tail_gap = wall - prev_end
    print(f"  [tail after last dispatch: {tail_gap * 1e3:.1f} ms "
          f"(final V fetch / sync)]")

    out = {
        "config": {"n": N, "matrix": MATRIX},
        "backend": jax.default_backend(),
        "wall_s": round(wall, 4),
        "phases_s": {k: round(v, 4) for k, v in timer.times.items()},
        "n_dispatch": len(LOG),
        "host_dispatch_s": round(sum(r["host_s"] for r in LOG), 4),
        "tail_gap_s": round(tail_gap, 4),
        "launches": LOG,
    }
    with open(os.path.join(_HERE, "TRACE_DISPATCH.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("\nwrote TRACE_DISPATCH.json")


if __name__ == "__main__":
    main()
