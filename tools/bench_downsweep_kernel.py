"""Microbench: achieved MXU rate of the fused Cauchy downsweep kernel.

Times `cauchy_matmul` at the n=16384 headline's per-level shapes under both
f32 dot tiers ("highest" ~6 bf16 passes vs "bf16_3x" ~3), plus the root
`assemble_u` materialization, so the 0.6 s downsweep phase can be budgeted
against the kernel's real throughput (VERDICT r4 item 2c).

Run: PYTHONPATH=.:/root/.axon_site python tools/bench_downsweep_kernel.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from symmetric_eigenvalue_tpu.utils.timing import sync


def time_call(fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = int(os.environ.get("DK_N", "16384"))
    C = n
    key = jax.random.PRNGKey(0)
    results = {"n": n, "backend": jax.default_backend(), "levels": []}

    from symmetric_eigenvalue_tpu.kernels.pallas import cauchy_matmul as cm

    for m in (512, 2048, 8192):
        poles = jnp.sort(jax.random.uniform(key, (m,), jnp.float64))
        shift = poles[jax.random.randint(key, (m,), 0, m)]
        tau = jax.random.uniform(key, (m,), jnp.float64) * 1e-8
        zhat = jax.random.normal(key, (m,), jnp.float64)
        ninv = jnp.ones((m,), jnp.float64)
        X = jax.random.normal(key, (m, C), jnp.float32)
        flops = 2.0 * m * m * C
        row = {"m": m, "C": C}
        for prec in ("highest", "bf16_3x"):
            t = time_call(
                lambda: cm._cauchy_matmul(poles, shift, tau, zhat, ninv, X,
                                          256, min(512, m), 512, prec))
            row[prec] = {"s": round(t, 4),
                         "tflops": round(flops / t / 1e12, 2)}
        # number of times this shape runs in one n=16384 downsweep:
        # level with merge size m has n/m merges
        row["calls_per_downsweep"] = n // m
        results["levels"].append(row)
        print(json.dumps(row), flush=True)

    out_path = os.path.join(os.path.dirname(__file__), "..",
                            "DOWNSWEEP_KERNEL.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
