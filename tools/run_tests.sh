#!/bin/bash
# Full test suite, one pytest PROCESS PER FILE.
#
# Why: XLA:CPU segfaults deterministically partway through the one-process
# full suite on this host (2026-08-18, twice at the same test: an
# accumulation effect — the same compile succeeds in a fresh process; see
# CLAUDE.md "Hard-won host/infra facts").  Per-file processes trade a few
# minutes of interpreter/jax startup for a suite that actually finishes.
#
# Usage: tools/run_tests.sh [extra pytest args, e.g. -m "not slow"]
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD"
fail=0
summary=()
for f in tests/test_*.py; do
  out=$(timeout 1500 python -m pytest "$f" -q "$@" 2>&1)
  rc=$?
  line=$(echo "$out" | grep -E "passed|failed|error|no tests ran" | tail -1)
  [ -z "$line" ] && line="(no summary; rc=$rc)"
  if [ $rc -ne 0 ]; then
    fail=1
    echo "FAIL $f: $line"
    echo "$out" | tail -40
  else
    echo "ok   $f: $line"
  fi
  summary+=("$f rc=$rc")
done
exit $fail
