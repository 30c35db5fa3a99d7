"""Marginal (asymptotic) scaling efficiency: the same job at two input
sizes × two taskset-confined core counts (CURVE_CORES, default 2 and 8 —
see scaling_bench.py's silicon probe for why the VM cannot evidence
8→32).

Fixed per-stage barrier cost F does not parallelize; per-row work W(n)
does.  T(n, c) ≈ F_c + W(n)/s_c, so differencing two input sizes cancels
F: eff_∞ = dT_lo/dn / ((hi/lo) · dT_hi/dn).  At 10¹²-document scale the
per-partition work dwarfs the scheduling floor, so the marginal number —
not the small-input two-point ratio — is the regime the north_rule's
"≥0.8 from N to 4N executors" describes.

Covers both throughput headliners (map_pipeline, er_resolve); min of
CURVE_REPS (default 2) wall times per point; steal recorded.  Writes
BENCH/SCALING_CURVE.md.  Usage: python scripts/scaling_curve.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CORES = [int(x) for x in os.environ.get("CURVE_CORES", "2,8").split(",")]
REPS = int(os.environ.get("CURVE_REPS", "2"))
MAP_SIZES = [int(x) for x in os.environ.get(
    "CURVE_MAP_SIZES", "30000,90000").split(",")]
ER_SIZES = [int(x) for x in os.environ.get(
    "CURVE_ER_SIZES", "200000,600000").split(",")]

RUNNER = r"""
import sys, time
sys.path.insert(0, {here!r})
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType
from metasra_pipeline_spark.session import get_spark
from metasra_pipeline_spark.datagen import synth_documents
spark = get_spark("curve", cores={cores}, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
@F.pandas_udf(LongType())
def _warm(x: pd.Series) -> pd.Series:
    return x
spark.range(0, 64 * 1000, 1, 64).select(F.sum(_warm("id"))).collect()
docs = (synth_documents(spark, {n}, seed=43)
        .select("doc_id", "spans").localCheckpoint(eager=True))
t0 = time.time()
if {job!r} == "er":
    from metasra_pipeline_spark.er.resolution import resolve_entities
    resolve_entities(spark, docs)["clusters"] \
        .write.format("noop").mode("overwrite").save()
else:
    from metasra_pipeline_spark.plans.pipeline import run_mapping_pipeline
    from metasra_pipeline_spark.refdata import load_refdata
    ref = load_refdata(spark)
    run_mapping_pipeline(spark, docs, ref).mapped_terms \
        .write.format("noop").mode("overwrite").save()
print("RESULT", time.time() - t0)
"""


def _steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def run(job: str, n: int, cores: int) -> tuple[float, float]:
    code = RUNNER.format(here=HERE, cores=cores, n=n, job=job)
    best, best_steal = float("inf"), 0.0
    for _ in range(REPS):
        s0 = _steal()
        out = subprocess.run(
            ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code],
            capture_output=True, text=True, timeout=4000)
        steal = round((_steal() - s0) / 100, 1)
        for line in reversed(out.stdout.strip().splitlines()):
            if line.startswith("RESULT"):
                t = float(line.split()[1])
                if t < best:
                    best, best_steal = t, steal
                break
        else:
            raise RuntimeError(out.stdout[-1500:] + out.stderr[-1500:])
    return best, best_steal


def main() -> None:
    c_lo, c_hi = CORES
    ratio = c_hi / c_lo
    jobs = {"map": MAP_SIZES, "er": ER_SIZES}
    results: dict = {}
    for job, sizes in jobs.items():
        results[job] = {}
        for n in sizes:
            results[job][n] = {}
            for c in CORES:
                t, st = run(job, n, c)
                results[job][n][c] = {"t": round(t, 1), "steal_s": st}
                print(json.dumps({"job": job, "n": n, "cores": c,
                                  "t": round(t, 1), "steal_s": st}),
                      flush=True)

    lines = [
        "# SCALING CURVE — marginal efficiency vs input size "
        "(taskset-confined, min of %d reps)" % REPS,
        "",
        f"Generated {datetime.now(timezone.utc).isoformat()}.  "
        f"Cores: {c_lo} vs {c_hi}.  Differencing the two input sizes "
        "cancels the core-count-independent scheduling floor; the "
        "marginal number is the 10¹²-doc regime (per-partition work ≫ "
        "per-stage scheduling).",
        "",
        f"| job | docs | T({c_lo} cores) s | T({c_hi} cores) s | "
        "two-point efficiency |",
        "|---|---|---|---|---|",
    ]
    marginals = {}
    for job, sizes in jobs.items():
        for n in sizes:
            t_lo = results[job][n][c_lo]["t"]
            t_hi = results[job][n][c_hi]["t"]
            lines.append(f"| {job} | {n:,} | {t_lo} | {t_hi} | "
                         f"{(t_lo / t_hi) / ratio:.3f} |")
        n0, n1 = sizes[0], sizes[-1]
        d_lo = results[job][n1][c_lo]["t"] - results[job][n0][c_lo]["t"]
        d_hi = results[job][n1][c_hi]["t"] - results[job][n0][c_hi]["t"]
        marginals[job] = (d_lo / d_hi) / ratio if d_hi > 0 else float("nan")
    lines += [
        "",
        "**Marginal (asymptotic) scaling efficiency** — "
        + ", ".join(f"{j}: **{m:.3f}**" for j, m in marginals.items())
        + " (north_rule target ≥ 0.8; compare the silicon ceiling in "
        "BENCH/BASELINE.md — the hypervisor itself does not deliver "
        "perfectly linear cores).",
        "",
        "```json",
        json.dumps(results, indent=1),
        "```",
    ]
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "BENCH", "SCALING_CURVE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"marginal_efficiency": {k: round(v, 4)
                                              for k, v in marginals.items()}}))


if __name__ == "__main__":
    main()
