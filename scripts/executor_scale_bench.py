"""Executor-COUNT scaling emulation (the faithful N → 4N reading).

The north_rule's criterion is throughput efficiency when *executors*
grow from N to 4N.  `scaling_bench.py` emulates that as local[2] →
local[8]; this is pessimistic in one local-mode-specific way: 8
threads in ONE JVM share a heap, and the measured CPU inflation
(~1.4×, BENCH/ANALYSIS.md) comes from GC/scheduler pressure a real
cluster never sees — a real 4N deployment has 4× the *JVMs*, each the
same size as before.

This script emulates that faithfully for the mapping pipeline, which
is shared-nothing per document (the reference's own production shape:
independent Condor chunk jobs, create_condorized_pipeline.py:81-119).

WEAK-scaling design: hi = four 2-core JVMs on disjoint taskset cores,
each processing the SAME per-JVM workload as the single lo JVM (4×
total input at 4× executors).  Per-JVM fixed cost (JVM start, codegen,
the ~60 sequential driver jobs' scheduling floor) is identical on both
sides and cancels; throughput efficiency = (4·D/t_hi)/(D/t_lo)/4 =
t_lo/t_hi.  A strong-scaling variant (split one input 4 ways,
BENCH_DOC_MOD/REM in bench.py) was measured first and is
fixed-cost-dominated at sandbox doc counts — verdict log in
BENCH/ANALYSIS.md.

ER is NOT run here: it is cross-document (blocking joins span the
corpus), so a real cluster runs ONE ER job over 4N executors — the
in-process local[2]→local[8] measurement in scaling_bench.py is the
honest emulation for it.

Usage: python scripts/executor_scale_bench.py
Appends an "Executor-count emulation" section to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor
from datetime import datetime, timezone

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def _run_one(cores: str, extra_env: dict) -> float:
    env = dict(os.environ)
    env.update({
        "BENCH_ONLY": "map_pipeline",
        "SPARK_GRAFT_CPUS": "2",
        "SPARK_SHUFFLE_PARTITIONS": "6",
        "SPARK_GRAFT_SF_DIR": os.environ.get("SPARK_GRAFT_SF_DIR",
                                             "/root/testdata/sf0.1"),
        "BENCH_MAP_DOCS": os.environ.get("BENCH_MAP_DOCS", "60000"),
    })
    env.update(extra_env)
    out = subprocess.run(
        ["taskset", "-c", cores, sys.executable,
         os.path.join(HERE, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)["queries"]["map_pipeline"]
    raise RuntimeError(f"no JSON from bench on cores {cores}:\n"
                       f"{out.stdout[-1500:]}\n{out.stderr[-1500:]}")


def main() -> None:
    reps = int(os.environ.get("EXEC_SCALE_REPS", "3"))
    lo_walls, hi_walls, steals = [], [], []
    for _ in range(reps):
        s0 = _steal()
        lo_walls.append(_run_one("0-1", {}))
        # four same-size JVMs, disjoint cores, same per-JVM workload
        with ThreadPoolExecutor(max_workers=4) as ex:
            futs = [ex.submit(_run_one, cores, {})
                    for cores in ("0-1", "2-3", "4-5", "6-7")]
            per_proc = [f.result() for f in futs]
        hi_walls.append(max(per_proc))
        steals.append(round((_steal() - s0) / 100, 1))
    t_lo, t_hi = min(lo_walls), min(hi_walls)
    eff = t_lo / t_hi
    result = {
        "t_lo_1x2core_jvm": t_lo,
        "t_hi_4x2core_jvms_4x_data": t_hi,
        "efficiency_executor_count_weak": round(eff, 4),
        "lo_walls": lo_walls, "hi_walls": hi_walls,
        "steal_s_per_rep": steals,
        "map_docs_per_jvm": int(os.environ.get("BENCH_MAP_DOCS",
                                               "60000")),
    }
    print(json.dumps(result))
    section = [
        "",
        "## Executor-count emulation (map pipeline, 1×2-core JVM → "
        "4×2-core JVMs, weak scaling)",
        "",
        f"Generated {datetime.now(timezone.utc).isoformat()} by "
        "`scripts/executor_scale_bench.py` — the faithful N→4N "
        "*executor* reading: executor size constant (2 cores, own "
        "JVM/heap), count ×4 on disjoint taskset cores, each "
        "processing the same per-executor workload (total input 4×, so "
        "throughput efficiency = T_1/T_4 exactly; per-JVM fixed cost "
        "cancels).  The mapping pipeline is shared-nothing per "
        "document (the reference's own Condor production shape), so "
        "per-executor partitioning is result-identical.  ER stays in "
        "the in-process measurement above — it is cross-document and "
        "a real cluster runs it as one job.",
        "",
        "| metric | 1×2-core JVM | 4×2-core JVMs (4× data) |",
        "|---|---|---|",
        f"| map_pipeline wall (s, min of {reps}) | {t_lo} | {t_hi} |",
        "",
        f"**Executor-count throughput scaling efficiency: {eff:.3f}** "
        "(≥ 0.8 = north_rule gate).  Per-rep walls "
        f"lo={lo_walls} hi={hi_walls}, host steal/rep {steals} s.",
        "",
        "```json",
        json.dumps(result, indent=1),
        "```",
    ]
    path = os.path.join(HERE, "BENCH", "BASELINE.md")
    with open(path, "a") as f:
        f.write("\n".join(section) + "\n")
    print(f"appended to {path}")


if __name__ == "__main__":
    main()
