"""Scaling-efficiency curve: the same ER job at growing input sizes,
each at taskset-confined 8 and 32 cores.

Fixed per-stage barrier cost F does not parallelize; per-row work W(n)
does.  T(n, c) ≈ F_c + W(n)/s_c, so measured efficiency rises with n and
the asymptote (what a 10¹²-doc run sees) is the marginal-throughput
ratio: eff_∞ = (dT₈/dn) / (4 · dT₃₂/dn).  Writes BENCH/SCALING_CURVE.md
with the measured points, the marginal estimate, and the raw JSON.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SIZES = [int(x) for x in os.environ.get(
    "CURVE_SIZES", "100000,400000,1000000").split(",")]
CORES = [8, 32]

RUNNER = r"""
import sys, time
sys.path.insert(0, {here!r})
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType
from metasra_pipeline_spark.session import get_spark
from metasra_pipeline_spark.datagen import synth_documents
from metasra_pipeline_spark.er.resolution import resolve_entities
spark = get_spark("curve", cores={cores})
spark.sparkContext.setLogLevel("ERROR")
@F.pandas_udf(LongType())
def _warm(x: pd.Series) -> pd.Series:
    return x
spark.range(0, 64 * 1000, 1, 64).select(F.sum(_warm("id"))).collect()
docs = (synth_documents(spark, {n}, seed=43)
        .select("doc_id", "spans").localCheckpoint())
t0 = time.time()
resolve_entities(spark, docs)["clusters"] \
    .write.format("noop").mode("overwrite").save()
print("RESULT", time.time() - t0, flush=True)
"""


def run(n: int, cores: int) -> float:
    code = RUNNER.format(here=HERE, cores=cores, n=n)
    env = dict(os.environ)
    env.update({"SPARK_SHUFFLE_PARTITIONS": "64",
                "SPARK_DRIVER_MEM": "20g"})
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code],
        env=env, capture_output=True, text=True, timeout=3000)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("RESULT"):
            return float(line.split()[1])
    raise RuntimeError(out.stdout[-1500:] + out.stderr[-1500:])


def main() -> None:
    results: dict[int, dict[int, float]] = {}
    for n in SIZES:
        results[n] = {}
        for c in CORES:
            results[n][c] = round(run(n, c), 1)
            print(json.dumps({"n": n, "cores": c, "t": results[n][c]}),
                  flush=True)

    lines = [
        "# SCALING CURVE — efficiency vs input size (ER job, taskset-confined)",
        "",
        f"Generated {datetime.now(timezone.utc).isoformat()}.",
        "",
        "| docs | T(8 cores) s | T(32 cores) s | throughput ratio | efficiency |",
        "|---|---|---|---|---|",
    ]
    for n in SIZES:
        t8, t32 = results[n][8], results[n][32]
        lines.append(f"| {n:,} | {t8} | {t32} | {t8 / t32:.2f}× | "
                     f"{(t8 / t32) / 4:.3f} |")
    n_lo, n_hi = SIZES[0], SIZES[-1]
    d8 = results[n_hi][8] - results[n_lo][8]
    d32 = results[n_hi][32] - results[n_lo][32]
    marginal = (d8 / d32) / 4 if d32 > 0 else float("nan")
    lines += [
        "",
        f"**Marginal (asymptotic) efficiency** — fixed per-stage barrier "
        f"cost subtracted via differencing the {n_lo:,}- and {n_hi:,}-doc "
        f"points: **{marginal:.3f}**.  This is the regime a 10¹²-doc run "
        "operates in (per-partition work ≫ per-stage scheduling floor).",
        "",
        "```json",
        json.dumps(results, indent=1),
        "```",
    ]
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "BENCH", "SCALING_CURVE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("marginal_efficiency", round(marginal, 4))


if __name__ == "__main__":
    main()
