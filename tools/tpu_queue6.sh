#!/bin/bash
# Round-3 queue, take 5: queue5's headline job OOM'd in the wider-band
# batched cluster orth (flat pow2 segment grid -> 8.6 GB gather); the
# bucketed+chunked fix needs the headline re-measured FIRST, so queue5 is
# stopped after its in-flight dense16384 job and this queue takes over.
# Stop with: touch /tmp/tpu_queue6.stop
# Logs: /tmp/tpu_queue6.log (this), /tmp/q6_*.log (per job).
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_queue6.log
STOP=/tmp/tpu_queue6.stop

log() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

run_job() {
  name=$1; shift
  [ -f "$STOP" ] && { log "stop file; skipping $name"; return; }
  log "job $name: start"
  timeout "$JOB_TIMEOUT" flock /tmp/tpu_device.lock \
    env SE_DEVICE_LOCK_HELD=1 "$@" > "/tmp/q6_${name}.log" 2>&1
  log "job $name: rc=$?"
}

log "queue6 started"
# first job's timeout absorbs waiting for queue5's in-flight dense job
JOB_TIMEOUT=6600 run_job headline16384 python tools/backfill_bench_extra.py 16384 random 1 3
JOB_TIMEOUT=2400 run_job prof_headline env SE_PROFILE_BACKTRANSFORM=1 BENCH_N=16384 BENCH_REPS=2 python bench.py
JOB_TIMEOUT=3600 run_job leafretune python tools/leaf_retune.py 16384 64 128
JOB_TIMEOUT=3600 run_job bench32768 python tools/backfill_bench_extra.py 32768 random 1 2
JOB_TIMEOUT=2400 run_job dense4096band env DENSE_BAND=128 python tools/run_dense_eigh.py 4096 2
JOB_TIMEOUT=4800 run_job dense16384band env DENSE_BAND=128 python tools/run_dense_eigh.py 16384 1
JOB_TIMEOUT=7200 run_job jacobibisect python tools/bisect_jacobi_fault.py
log "queue6 complete"
