#!/bin/bash
# Round-5 TPU queue 2: n=32768 retry (force_scan fix), clustered single-jit
# probe, verified one-stage dense n=16384, streamed n=65536 full eigenpairs.
set -u
cd /root/repo
export PYTHONPATH=.:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

echo "=== q2p: refresh on-TPU kernel validation (kernel changed) ==="
timeout 2400 python tools/check_pallas_on_tpu.py 2>&1 | tail -15
echo "q2p exit=$?"

echo "=== q2a: n=32768 full eigenpairs retry (force_scan) ==="
BENCH_N=32768 BENCH_MATRIX=random BENCH_VECTORS=1 BENCH_REPS=1 \
  BENCH_BASELINE_CAP=1 \
  timeout 5400 python bench.py 2>&1 | tail -25
echo "q2a exit=$?"

echo "=== q2b: clustered n=4096 single-jit vs staged probe ==="
timeout 3600 python tools/clustered_singlejit_probe.py 4096 2>&1 | tail -10
echo "q2b exit=$?"

cp -f DOWNSWEEP_LEVELS.json DOWNSWEEP_LEVELS_RANDOM.json 2>/dev/null
echo "=== q2e: downsweep per-level profile n=16384 POISSON ==="
timeout 3600 python tools/profile_downsweep_levels.py 16384 poisson 2>&1 | tail -25
echo "q2e exit=$?"
cp -f DOWNSWEEP_LEVELS.json DOWNSWEEP_LEVELS_POISSON.json 2>/dev/null

echo "=== q2c: one-stage dense n=16384 VERIFIED ==="
timeout 5400 python tools/run_dense_eigh.py 16384 2>&1 | tail -12
echo "q2c exit=$?"

echo "=== q2d: n=65536 streamed full eigenpairs ==="
timeout 9000 python tools/run_n65536_full.py 65536 4096 256 2>&1 | tail -40
echo "q2d exit=$?"
echo "=== queue2 done ==="
