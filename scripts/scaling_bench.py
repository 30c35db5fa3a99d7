"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

A real N → 4N executor comparison isn't possible in this sandbox, so —
per the driver's instruction — the same data-dominated job runs at
local[8] and local[32] on identical input, and we report throughput at
both plus efficiency = (T_8 / T_32) / 4.

Each level runs in a fresh subprocess (fresh JVM, exact master).  The
workload is sized so data work dominates fixed scheduler overhead:
the relational/dedup suite at sf0.1 plus the mapping pipeline and ER
at BENCH_MAP_DOCS/BENCH_ER_DOCS synthesized documents.

Writes BENCH/BASELINE.md.  Usage: python scripts/scaling_bench.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, map_docs: int, er_docs: int) -> dict:
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_CPUS": str(cpus),
        "SPARK_GRAFT_SF_DIR": env.get("SPARK_GRAFT_SF_DIR",
                                      "/root/testdata/sf0.1"),
        "BENCH_MAP_DOCS": str(map_docs),
        "BENCH_ER_DOCS": str(er_docs),
    })
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"bench at local[{cpus}] produced no JSON:\n"
                       f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    map_docs = int(os.environ.get("BENCH_MAP_DOCS", "4000"))
    er_docs = int(os.environ.get("BENCH_ER_DOCS", "4000"))
    r8 = run_level(8, map_docs, er_docs)
    r32 = run_level(32, map_docs, er_docs)
    t8, t32 = r8["value"], r32["value"]
    eff = (t8 / t32) / 4.0
    lines = [
        "# BENCH — measured baselines + scaling evidence",
        "",
        f"Generated {datetime.now(timezone.utc).isoformat()} by "
        "`scripts/scaling_bench.py` (same input, two parallelism levels; "
        "the sandbox stand-in for N vs 4N executors per the driver "
        "instructions).",
        "",
        "| metric | local[8] | local[32] |",
        "|---|---|---|",
        f"| suite wall (s) | {t8} | {t32} |",
        f"| suite throughput (×) | 1.00 | {t8 / t32:.2f} |",
        f"| mapping pipeline docs/s | {r8['map_docs_per_sec']} | "
        f"{r32['map_docs_per_sec']} |",
        f"| entity-resolution docs/s | {r8['er_docs_per_sec']} | "
        f"{r32['er_docs_per_sec']} |",
        "",
        f"**Scaling efficiency (throughput-normalized, T₈/(4·T₃₂)): "
        f"{eff:.3f}** (target ≥ 0.8 from BASELINE.json north_rule; "
        "1.0 = perfect linear).",
        "",
        "Per-query seconds:",
        "",
        "| query | local[8] | local[32] |",
        "|---|---|---|",
    ]
    for q in r8["queries"]:
        lines.append(f"| {q} | {r8['queries'][q]} | "
                     f"{r32['queries'].get(q, '—')} |")
    lines += [
        "",
        "Raw JSON:",
        "```json",
        json.dumps({"local8": r8, "local32": r32, "efficiency": eff},
                   indent=1),
        "```",
    ]
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    path = os.path.join(HERE, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"t8": t8, "t32": t32, "efficiency": round(eff, 4)}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
