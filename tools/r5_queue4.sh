#!/bin/bash
# Round-5 TPU queue 4: Q2-dword A/B validation, dense two-stage n=16384
# artifact (VERDICT 1), n=32768 full eigenpairs via the streamed bench
# route (VERDICT 2).
set -u
cd /root/repo
export PYTHONPATH=.:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

echo "=== q4w: apply_q2 dword vs einsum A/B (n=2048, C=512) ==="
timeout 3000 python tools/check_q2_dword.py 2048 512 2>&1 | grep -v cpu_aot_loader | tail -6
WEXIT=$?
echo "q4w exit=$WEXIT"

echo "=== q4s: n=32768 full eigenpairs, streamed bench route ==="
BENCH_N=32768 BENCH_MATRIX=random BENCH_VECTORS=1 BENCH_REPS=1 \
  timeout 5400 python bench.py 2>&1 | tail -22
echo "q4s exit=$?"

echo "=== q4d: dense two-stage n=16384 -> DENSE_EIGH.json ==="
DENSE_BAND=128 timeout 10800 python tools/run_dense_eigh.py 16384 1 2>&1 | grep -v cpu_aot_loader | tail -16
echo "q4d exit=$?"
echo "=== queue4 done ==="
