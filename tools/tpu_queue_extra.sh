#!/bin/bash
# Stage-2 TPU job queue: waits for tools/tpu_queue_watcher.sh to log
# "queue complete" (or for its pid to exit), then re-measures the configs the
# round-3 G2-gram cut should win back (clustered n=4096, Poisson n=16384) and
# the headline.  Stop with: touch /tmp/tpu_queue.stop
# Logs: /tmp/tpu_queue2.log (this), /tmp/q2_*.log (per job).
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_queue2.log
STOP=/tmp/tpu_queue.stop
DEADLINE=$(( $(date +%s) + 11*3600 ))

log() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

log "stage-2 watcher started (waiting for stage 1)"
while true; do
  [ -f "$STOP" ] && { log "stop file present; exiting"; exit 0; }
  [ "$(date +%s)" -gt "$DEADLINE" ] && { log "deadline; exiting"; exit 0; }
  if grep -q "queue complete" /tmp/tpu_queue.log 2>/dev/null; then
    log "stage 1 complete"
    break
  fi
  if [ -f /tmp/tpu_watcher.pid ] && ! kill -0 "$(cat /tmp/tpu_watcher.pid)" 2>/dev/null; then
    log "stage-1 watcher exited without completing; proceeding anyway"
    break
  fi
  sleep 120
done

run_job() {
  name=$1; shift
  [ -f "$STOP" ] && { log "stop file; skipping $name"; return; }
  log "job $name: start"
  # hold the single-tenant device lock for the job (bench.py waits on it)
  timeout "$JOB_TIMEOUT" flock /tmp/tpu_device.lock \
    env SE_DEVICE_LOCK_HELD=1 "$@" > "/tmp/q2_${name}.log" 2>&1
  log "job $name: rc=$?"
}

JOB_TIMEOUT=1800 run_job clustered4096 env BENCH_N=4096 BENCH_MATRIX=clustered BENCH_REPS=3 python bench.py
JOB_TIMEOUT=2400 run_job dense4096band env DENSE_BAND=128 python tools/run_dense_eigh.py 4096 2
JOB_TIMEOUT=4800 run_job dense16384band env DENSE_BAND=128 python tools/run_dense_eigh.py 16384 1
JOB_TIMEOUT=2400 run_job poisson16384 env BENCH_N=16384 BENCH_MATRIX=poisson BENCH_REPS=2 python bench.py
JOB_TIMEOUT=2400 run_job headline16384 env BENCH_N=16384 BENCH_REPS=3 python bench.py
log "queue complete"
