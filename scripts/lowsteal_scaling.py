"""Opportunistic low-steal scaling reps (concurrent-workload mode).

The host is an overcommitted hypervisor: wall times vary with CPU
steal by ±60%, and BASELINE.md's methodology already treats the
minimum over repetitions as the least-stolen estimate.  This script
makes that explicit: it samples /proc/stat steal, and only when the
host is quiet does it spend a repetition — hi level (cheap, ~3 min)
first as a window probe, then the lo level (expensive, ~9 min) if the
window held.  Results merge with any prior reps by taking minima, so
running this after scaling_bench.py can only sharpen the estimate.

Usage: python scripts/lowsteal_scaling.py [deadline_minutes]
Prints one JSON line per completed rep and a final summary; appends a
section to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import HERE, run_level, silicon_probe  # noqa: E402


def _steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def steal_rate(window_s: int = 45) -> float:
    s0 = _steal()
    time.sleep(window_s)
    return (_steal() - s0) / 100 / window_s * 60  # steal s per minute


def main() -> None:
    deadline_min = float(sys.argv[1]) if len(sys.argv) > 1 else 90
    # this harness reps + takes minima itself; bench.py's own in-session
    # min-of-R (BENCH_REPS, default 3) would triple every rep's wall and
    # make the steal-admissibility check (scaled to the reported min
    # wall, not the 3x rep duration) unpassable for the lo level
    os.environ.setdefault("BENCH_REPS", "1")
    quiet = float(os.environ.get("LOWSTEAL_THRESHOLD", "6"))  # s/min
    lo, hi = 2, 8
    map_docs = int(os.environ.get("BENCH_MAP_DOCS", "60000"))
    er_docs = int(os.environ.get("BENCH_ER_DOCS", "300000"))
    t_end = time.time() + deadline_min * 60
    lo_walls: list[float] = []
    hi_walls: list[float] = []
    log: list[dict] = []
    # silicon floor: steal accounting misses covert degradation (host
    # frequency caps / hypervisor CPU throttling measured at 3-5x on
    # this box with ZERO steal), so gate on a direct pure-CPU probe
    # too; the per-rep probe also gives every logged pair its own
    # same-window silicon ceiling for the ceiling-relative reading.
    # Floor default 6.5 ≈ 82% of the best recorded healthy lo rate
    # (7.96 units/s, BENCH/BASELINE.md).
    probe_floor = float(os.environ.get("LOWSTEAL_PROBE_FLOOR", "6.5"))
    while time.time() < t_end:
        rate = steal_rate()
        if rate > quiet:
            print(json.dumps({"waiting": True,
                              "steal_s_per_min": round(rate, 1)}),
                  flush=True)
            time.sleep(60)
            continue
        pr = silicon_probe(lo, hi)
        if pr["lo_units_per_s"] < probe_floor:
            print(json.dumps({"waiting": True, "silicon_probe": pr,
                              "reason": "host silicon degraded"}),
                  flush=True)
            time.sleep(60)
            continue
        r_hi = run_level(hi, map_docs, er_docs, reps=1, concurrent=True)
        hi_walls.append(r_hi["value"])
        log.append({"level": hi, "wall": r_hi["value"],
                    "steal_s": r_hi["steal_s_per_rep"][0],
                    "util_pct": r_hi["core_util_pct_per_rep"][0],
                    "probe_before": pr})
        print(json.dumps(log[-1]), flush=True)
        # only burn 9 minutes on the lo level if the window held
        if r_hi["steal_s_per_rep"][0] > quiet * r_hi["value"] / 60 * 3:
            continue
        if time.time() > t_end:
            break
        r_lo = run_level(lo, map_docs, er_docs, reps=1, concurrent=True)
        lo_walls.append(r_lo["value"])
        log.append({"level": lo, "wall": r_lo["value"],
                    "steal_s": r_lo["steal_s_per_rep"][0],
                    "util_pct": r_lo["core_util_pct_per_rep"][0]})
        print(json.dumps(log[-1]), flush=True)
        if len(lo_walls) >= 3 and len(hi_walls) >= 3:
            break
    if not lo_walls or not hi_walls:
        print(json.dumps({"error": "no quiet window found", "log": log}))
        return
    probe = silicon_probe(lo, hi)
    t_lo, t_hi = min(lo_walls), min(hi_walls)
    eff = (t_lo / t_hi) / (hi / lo)
    result = {"t_lo": t_lo, "t_hi": t_hi,
              "efficiency_concurrent_lowsteal": round(eff, 4),
              "lo_walls": lo_walls, "hi_walls": hi_walls,
              "silicon_ceiling": probe["ceiling_efficiency"],
              "reps_log": log}
    print(json.dumps(result), flush=True)
    section = [
        "",
        "## Opportunistic low-steal session (concurrent workload)",
        "",
        f"Generated {datetime.now(timezone.utc).isoformat()} by "
        "`scripts/lowsteal_scaling.py`: repetitions are spent only in "
        f"windows where host steal < {quiet} s/min (sampled before "
        "each rep), making the documented min-is-least-stolen-estimate "
        "methodology explicit.  Same workload and levels as the "
        "concurrent mode above.",
        "",
        f"**Efficiency (least-stolen): {eff:.3f}** "
        f"(t_lo={t_lo} s over {len(lo_walls)} rep(s), t_hi={t_hi} s "
        f"over {len(hi_walls)} rep(s); silicon ceiling this session "
        f"{probe['ceiling_efficiency']:.3f}).",
        "",
        "```json",
        json.dumps(result, indent=1),
        "```",
    ]
    with open(os.path.join(HERE, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(section) + "\n")
    print("appended to BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
