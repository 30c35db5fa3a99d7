"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Two throughput headliners mirror the north_star's docs/sec target:
- ``map_pipeline``: the full 29-stage semantic mapping pipeline over
  synthesized kv-span documents (docs/sec reported);
- ``er_resolve``: blocking → scoring → connected components over
  synthesized duplicate-cluster documents (docs/sec reported).
The relational/dedup/similarity queries run against the sf parquet
tables.  Scaling evidence (local[8] vs local[32]) is produced by
``scripts/scaling_bench.py`` → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_map_docs = int(os.environ.get("BENCH_MAP_DOCS", "1000"))
    n_er_docs = int(os.environ.get("BENCH_ER_DOCS", "2000"))

    from metasra_pipeline_spark.session import get_spark
    spark = get_spark("metasra-bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm python workers once: worker spawn + pandas/pyarrow imports are
    # one-time costs that a long-running production job amortizes to
    # noise; without this they dominate short benchmark runs
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _warm(x: pd.Series) -> pd.Series:
        return x
    spark.range(0, 64 * 1000, 1, 64).select(F.sum(_warm("id"))).collect()

    import __spark_entry__ as em
    from metasra_pipeline_spark.datagen import synth_documents
    from metasra_pipeline_spark.er.resolution import resolve_entities
    from metasra_pipeline_spark.plans.pipeline import run_chunked_pipeline
    from metasra_pipeline_spark.refdata import load_refdata

    qs = em.queries()
    timings: dict[str, float] = {}

    verbose = os.environ.get("BENCH_VERBOSE", "") == "1"
    # min-of-R per query IN THE SAME SESSION: the host is an
    # overcommitted hypervisor (±60% wall variance, steal up to
    # ~800 s/run recorded in BENCH/ANALYSIS.md), so a single-shot
    # number is a coin flip; the minimum is the least-stolen estimate
    reps = max(1, int(os.environ.get("BENCH_REPS", "3")))

    def timed(name, fn):
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        if verbose:
            print(f"# {name}: {timings[name]}s", file=sys.stderr, flush=True)

    relational = ["q01_pricing_summary", "q03_join_revenue", "q06_window_min",
                  "q09_interval_containment", "q15_lsh_pairs", "q16_simhash",
                  "q18_jaccard_pairs", "q21_knn_per_label",
                  "q23_quality", "q27_graph_components",
                  "q38_cosine_neardup", "q39_asof_join"]
    only = {x for x in os.environ.get("BENCH_ONLY", "").split(",") if x}
    if only:
        relational = [q for q in relational if q in only]
    for name in relational:
        timed(name, lambda n=name: qs[n](spark, sf_dir)
              .write.format("noop").mode("overwrite").save())

    # semantic mapping pipeline throughput (docs/sec)
    t_map = t_er = None
    run_map = not only or "map_pipeline" in only
    run_er = not only or "er_resolve" in only
    concurrent = os.environ.get("BENCH_CONCURRENT", "") == "1"
    if run_map or run_er:
        ref = load_refdata(spark)
    if concurrent and run_map and run_er:
        # production-workload mode: the two independent headline jobs
        # run concurrently under the FAIR scheduler — one job's tasks
        # fill the other's stage-barrier drains, which is how a real
        # multi-tenant cluster is operated.  Reports the suite wall
        # (throughput = total docs / wall) plus each job's overlapped
        # wall (annotated: they share the cluster).
        from concurrent.futures import ThreadPoolExecutor
        map_docs = (synth_documents(spark, n_map_docs, seed=42)
                    .select("doc_id", "spans").localCheckpoint(eager=True))
        er_docs = (synth_documents(spark, n_er_docs, seed=43)
                   .select("doc_id", "spans").localCheckpoint(eager=True))

        def do_map():
            t0 = time.time()
            run_chunked_pipeline(spark, map_docs, ref, n_chunks=1) \
                .mapped_terms.write.format("noop").mode("overwrite").save()
            return time.time() - t0

        def do_er():
            t0 = time.time()
            resolve_entities(spark, er_docs)["clusters"] \
                .write.format("noop").mode("overwrite").save()
            return time.time() - t0

        wall = t_map = t_er = None
        for _ in range(reps):
            t0 = time.time()
            with ThreadPoolExecutor(2) as ex:
                f_map, f_er = ex.submit(do_map), ex.submit(do_er)
                r_map, r_er = f_map.result(), f_er.result()
            r_wall = time.time() - t0
            if wall is None or r_wall < wall:
                wall, t_map, t_er = r_wall, r_map, r_er
        timings["map_pipeline"] = round(t_map, 3)
        timings["er_resolve"] = round(t_er, 3)
        out = {
            "metric": "bench_suite_seconds",
            "value": round(wall, 3),
            "unit": "sec",
            "queries": timings,
            "sf": sf_dir.rstrip("/").split("sf")[-1],
            "cpus": int(cpus),
            "reps": reps,
            "concurrent": True,
            "map_docs_per_sec": round(n_map_docs / t_map, 2),
            "er_docs_per_sec": round(n_er_docs / t_er, 2),
            "suite_docs_per_sec": round((n_map_docs + n_er_docs) / wall, 2),
        }
        print(json.dumps(out))
        return
    def gc_pause():
        # isolation between bench sections: localCheckpoint blocks and
        # cached broadcast pieces from the previous section linger in
        # the block manager until the ContextCleaner notices the
        # dropped Python refs; without a forced GC the next section's
        # reps run against that heap residue (measured: ER 17.6 s
        # in-suite vs 11.4 s alone at 2k docs; map 72.2 s after the
        # 12 relational queries vs 31.0 s alone at 1k docs / sf0.1)
        import gc
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(2)

    if run_map:
        if relational:
            gc_pause()
        map_docs = synth_documents(spark, n_map_docs, seed=42)
        # executor-count-emulation sharding (scripts/
        # executor_scale_bench.py): this process handles the doc_id
        # residue class REM mod MOD of the SAME global synthesized set
        # — four 2-core JVMs each taking one class together process
        # exactly the input one JVM processes unsharded
        mod = int(os.environ.get("BENCH_DOC_MOD", "0"))
        if mod > 1:
            rem = int(os.environ.get("BENCH_DOC_REM", "0"))
            # pmod, not abs(hash) % mod: abs(Integer.MIN_VALUE)
            # overflows negative and would drop that row from every
            # residue class, breaking the shards-cover-input invariant
            map_docs = map_docs.where(
                F.pmod(F.hash("doc_id"), F.lit(mod)) == F.lit(rem))
        map_docs = (map_docs
                    .select("doc_id", "spans").localCheckpoint(eager=True))
        # run_chunked_pipeline is the production shape (per-chunk jobs,
        # gather_mappings.py:25-41) but each chunk re-pays the fixed
        # per-pipeline CPU (codegen, broadcasts, shared-string
        # expansion); at sandbox doc counts that duplication outweighs
        # the barrier-drain fill (measured 95s @ C=1 vs 150-197s @ C=4,
        # 30k docs / 8 cores), so the bench defaults to one chunk
        n_chunks = int(os.environ.get("BENCH_MAP_CHUNKS", "1"))
        t_map = None
        for _ in range(reps):
            t0 = time.time()
            run_chunked_pipeline(spark, map_docs, ref, n_chunks=n_chunks) \
                .mapped_terms.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            t_map = dt if t_map is None else min(t_map, dt)
        timings["map_pipeline"] = round(t_map, 3)
        if verbose:
            print(f"# map_pipeline: {t_map:.1f}s", file=sys.stderr,
                  flush=True)

    # entity-resolution throughput (docs/sec)
    if run_er:
        if run_map or relational:
            gc_pause()
        er_docs = (synth_documents(spark, n_er_docs, seed=43)
                   .select("doc_id", "spans").localCheckpoint(eager=True))
        t_er = None
        for _ in range(reps):
            t0 = time.time()
            resolve_entities(spark, er_docs)["clusters"] \
                .write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            t_er = dt if t_er is None else min(t_er, dt)
        timings["er_resolve"] = round(t_er, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "bench_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "cpus": int(cpus),
        "reps": reps,
        "map_docs_per_sec": round(n_map_docs / t_map, 2) if t_map else None,
        "er_docs_per_sec": round(n_er_docs / t_er, 2) if t_er else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
