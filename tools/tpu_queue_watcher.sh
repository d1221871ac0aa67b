#!/bin/bash
# Waits for the tunneled TPU to come back (outage of 2026-08-17 ~21:30) and
# then runs the round-3 artifact queue sequentially.  Stop with:
#   touch /tmp/tpu_queue.stop
# Logs: /tmp/tpu_queue.log (this), /tmp/q_*.log (per job).
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_queue.log
STOP=/tmp/tpu_queue.stop
DEADLINE=$(( $(date +%s) + 9*3600 ))

log() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

probe() {
  timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform in ("axon", "tpu")
EOF
}

log "watcher started"
while true; do
  [ -f "$STOP" ] && { log "stop file present; exiting"; exit 0; }
  [ "$(date +%s)" -gt "$DEADLINE" ] && { log "deadline; exiting"; exit 0; }
  if probe; then
    log "TPU is back"
    break
  fi
  log "tpu down; sleeping 120s"
  sleep 120
done

run_job() {
  name=$1; shift
  [ -f "$STOP" ] && { log "stop file; skipping $name"; return; }
  log "job $name: start"
  # hold the single-tenant device lock for the job (bench.py waits on it)
  timeout "$JOB_TIMEOUT" flock /tmp/tpu_device.lock \
    env SE_DEVICE_LOCK_HELD=1 "$@" > "/tmp/q_${name}.log" 2>&1
  log "job $name: rc=$?"
}

# ordered by value-per-minute in case the tunnel window is short: hardware
# kernel validation + the profile that unblocks epilogue tuning first,
# long backfills and the bisect last
JOB_TIMEOUT=1200 run_job pallas python tools/check_pallas_on_tpu.py
JOB_TIMEOUT=2400 run_job profile16384 env SE_PROFILE_BACKTRANSFORM=1 BENCH_N=16384 BENCH_REPS=2 python bench.py
JOB_TIMEOUT=1800 run_job backfill65536 python tools/backfill_bench_extra.py 65536 random 0 2
JOB_TIMEOUT=1800 run_job dense4096 python tools/run_dense_eigh.py 4096 2
JOB_TIMEOUT=3600 run_job leafretune python tools/leaf_retune.py 16384 64 128
JOB_TIMEOUT=3600 run_job dense16384 python tools/run_dense_eigh.py 16384 1
JOB_TIMEOUT=3600 run_job bench32768 python tools/backfill_bench_extra.py 32768 random 1 2
JOB_TIMEOUT=7200 run_job jacobibisect python tools/bisect_jacobi_fault.py
log "queue complete"
