#!/usr/bin/env python
"""Bisect the P boundary of the batched-Jacobi device fault (VERDICT r2 #8).

Each probe runs tools/repro_jacobi_fault.py in its OWN subprocess: the fault
('ABORTED: TPU backend error') wedges the faulting process but the device
recovers for fresh processes, so sequential subprocesses are safe.  Results
land in JACOBI_FAULT_BISECT.json.

Usage: PYTHONPATH=.:/root/.axon_site python tools/bisect_jacobi_fault.py
"""

import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPRO = os.path.join(_HERE, "tools", "repro_jacobi_fault.py")
OUT = os.path.join(_HERE, "JACOBI_FAULT_BISECT.json")


def probe(P, b, timeout=1500):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{_HERE}:/root/.axon_site"
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, REPRO, str(P), str(b)],
                           capture_output=True, text=True, timeout=timeout,
                           env=env)
        ok = r.returncode == 0 and ": OK in" in r.stdout
        tail = (r.stdout + r.stderr).strip().splitlines()
        tail = [l for l in tail if "WARNING" not in l][-3:]
    except subprocess.TimeoutExpired:
        ok, tail = False, ["TIMEOUT"]
    return {"P": P, "b": b, "ok": ok, "wall_s": round(time.time() - t0, 1),
            "tail": tail}


def main():
    results = []

    def run(P, b):
        r = probe(P, b)
        results.append(r)
        print(f"P={P} b={b}: {'OK' if r['ok'] else 'FAULT'} "
              f"({r['wall_s']}s) {'' if r['ok'] else r['tail'][-1][:100]}",
              flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        return r["ok"]

    # bisect P at b=32 between known-good 1024 and known-bad 2048
    lo, hi = 1024, 2048
    if not run(lo, 32):
        print("known-good P=1024 faulted?! stopping", flush=True)
        return
    if run(hi, 32):
        print("known-bad P=2048 passed — fault not reproducible today",
              flush=True)
        return
    while hi - lo > 128:
        mid = ((lo + hi) // 2 // 128) * 128
        if run(mid, 32):
            lo = mid
        else:
            hi = mid
    print(f"boundary: P={lo} OK, P={hi} FAULT (b=32)", flush=True)
    # does b matter at the faulting P?
    for b in (16, 64):
        run(hi, b)
    # and is it total-work or P-count? same total elements, smaller P
    run(hi // 2, 64)
    with open(OUT, "w") as f:
        json.dump({"boundary_ok": lo, "boundary_fault": hi,
                   "probes": results}, f, indent=1)


if __name__ == "__main__":
    main()
