#!/bin/bash
# Round-3 queue, take 3 (previous session died mid-queue): refresh the
# BENCH_EXTRA artifacts with the post-clip-fix epilogue, profile the
# clustered config, then the dense one-shots and tuning/bisect jobs.
# Stop with: touch /tmp/tpu_queue.stop
# Logs: /tmp/tpu_queue4.log (this), /tmp/q4_*.log (per job).
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_queue4.log
STOP=/tmp/tpu_queue.stop

log() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

run_job() {
  name=$1; shift
  [ -f "$STOP" ] && { log "stop file; skipping $name"; return; }
  log "job $name: start"
  timeout "$JOB_TIMEOUT" flock /tmp/tpu_device.lock \
    env SE_DEVICE_LOCK_HELD=1 "$@" > "/tmp/q4_${name}.log" 2>&1
  log "job $name: rc=$?"
}

log "queue4 started"
JOB_TIMEOUT=1800 run_job clustered4096 python tools/backfill_bench_extra.py 4096 clustered 1 3
JOB_TIMEOUT=2400 run_job poisson16384 python tools/backfill_bench_extra.py 16384 poisson 1 2
JOB_TIMEOUT=1800 run_job prof_clustered env SE_PROFILE_BACKTRANSFORM=1 BENCH_N=4096 BENCH_MATRIX=clustered BENCH_REPS=2 python bench.py
JOB_TIMEOUT=3600 run_job dense16384 python tools/run_dense_eigh.py 16384 1
JOB_TIMEOUT=2400 run_job dense4096band env DENSE_BAND=128 python tools/run_dense_eigh.py 4096 2
JOB_TIMEOUT=4800 run_job dense16384band env DENSE_BAND=128 python tools/run_dense_eigh.py 16384 1
JOB_TIMEOUT=3600 run_job bench32768 python tools/backfill_bench_extra.py 32768 random 1 2
JOB_TIMEOUT=3600 run_job leafretune python tools/leaf_retune.py 16384 64 128
JOB_TIMEOUT=7200 run_job jacobibisect python tools/bisect_jacobi_fault.py
log "queue4 complete"
