"""Probe-gated executor-count scaling confirmation.

Loops until the deadline: run the pure-CPU silicon probe; only when
the host is at full health (lo >= PROBE_LO_FLOOR units/s AND
pure-CPU 2->8 ceiling >= PROBE_CEIL_FLOOR) spend the ~10-minute
executor-count rep (scripts/executor_scale_bench.py with
EXEC_SCALE_REPS=1 BENCH_REPS=1).  Degraded probes are logged and
skipped — the round-4 protocol that produced the 0.967 gate record.

Usage: python scripts/gated_exec_scale.py [deadline_minutes]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import silicon_probe  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LO_FLOOR = float(os.environ.get("PROBE_LO_FLOOR", "11.3"))
CEIL_FLOOR = float(os.environ.get("PROBE_CEIL_FLOOR", "0.92"))


def main() -> None:
    deadline_min = float(sys.argv[1]) if len(sys.argv) > 1 else 120
    t_end = time.time() + deadline_min * 60
    attempts = 0
    while time.time() < t_end:
        pr = silicon_probe(2, 8)
        healthy = (pr["lo_units_per_s"] >= LO_FLOOR
                   and pr["ceiling_efficiency"] >= CEIL_FLOOR)
        print(json.dumps({"probe": pr, "healthy": healthy}), flush=True)
        if not healthy:
            time.sleep(300)
            continue
        attempts += 1
        env = dict(os.environ,
                   EXEC_SCALE_REPS="1", BENCH_REPS="1")
        try:
            out = subprocess.run(
                [sys.executable,
                 os.path.join(HERE, "scripts", "executor_scale_bench.py")],
                env=env, capture_output=True, text=True, timeout=3600)
        except subprocess.TimeoutExpired:
            print(json.dumps({"attempt": attempts,
                              "error": "rep timed out (3600s)"}),
                  flush=True)
            continue
        if out.returncode != 0:
            print(json.dumps({"attempt": attempts,
                              "error": f"rep rc={out.returncode}",
                              "stderr_tail": out.stderr[-500:]}),
                  flush=True)
            continue
        for line in out.stdout.strip().splitlines():
            if line.startswith("{"):
                print(line, flush=True)
        if attempts >= int(os.environ.get("GATED_MAX_ATTEMPTS", "2")):
            break
    print(json.dumps({"done": True, "attempts": attempts}), flush=True)


if __name__ == "__main__":
    main()
