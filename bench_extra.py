"""Extra benchmarks for optimization work (guide §1.4 noop-sink isolation).

NOT the driver bench — ``bench.py`` is frozen for measurement.  This file
isolates phases of the expensive queries so optimizations target the
right operator.  Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        python bench_extra.py [section ...]

Sections: map_tail, er_phases, q27_phases, all (default).
Prints one ``# name: seconds`` line per phase to stderr and a JSON line
to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sections = set(sys.argv[1:]) or {"all"}
    reps = max(1, int(os.environ.get("BENCH_REPS", "2")))

    from metasra_pipeline_spark.session import get_spark
    spark = get_spark("metasra-bench-extra", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _warm(x: pd.Series) -> pd.Series:
        return x
    spark.range(0, 64 * 1000, 1, 64).select(F.sum(_warm("id"))).collect()

    timings: dict[str, float] = {}

    def timed(name, fn, n=reps):
        best = None
        for _ in range(n):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr, flush=True)

    def want(s):
        return "all" in sections or s in sections

    if want("map_tail"):
        from metasra_pipeline_spark.datagen import synth_documents
        from metasra_pipeline_spark.operators import consolidate as C
        from metasra_pipeline_spark.plans.pipeline import run_mapping_pipeline
        from metasra_pipeline_spark.refdata import load_refdata

        ref = load_refdata(spark)
        docs = (synth_documents(spark, 1000, seed=42)
                .select("doc_id", "spans").localCheckpoint(eager=True))
        spark.sparkContext.setJobDescription("map: full pipeline")
        res = run_mapping_pipeline(spark, docs, ref)
        # frames below are built on the pipeline's materialized cuts
        m, inf, kv = res.matches, res.inf_edges, res.kv
        spark.sparkContext.setJobDescription("map: mapped_terms (full tail)")
        timed("map_mapped_terms_tail", lambda: _noop(res.mapped_terms))
        spark.sparkContext.setJobDescription("map: term_provenance")
        timed("map_term_provenance",
              lambda: _noop(C.term_provenance(m, inf, kv)))
        spark.sparkContext.setJobDescription("map: reachable_terms")
        timed("map_reachable_terms",
              lambda: _noop(C.reachable_terms(m, inf)))
        spark.sparkContext.setJobDescription(None)

    if want("er_phases"):
        from metasra_pipeline_spark.datagen import synth_documents
        from metasra_pipeline_spark.er import resolution as R

        docs = (synth_documents(spark, 2000, seed=43)
                .select("doc_id", "spans").localCheckpoint(eager=True))
        spark.sparkContext.setJobDescription("er: profiles")
        prof = None

        def _profiles():
            nonlocal prof
            prof = R.doc_profiles(docs).localCheckpoint(eager=True)
        timed("er_profiles", _profiles)
        spark.sparkContext.setJobDescription("er: idf")
        idf = default_idf = None

        def _idf():
            nonlocal idf, default_idf
            idf, default_idf = R.token_idf(prof)
        timed("er_idf", _idf)
        spark.sparkContext.setJobDescription("er: reps")
        reps_df = None

        def _reps():
            nonlocal reps_df
            reps_df = R.representative_profiles(prof).localCheckpoint(
                eager=True)
        timed("er_reps", _reps)
        spark.sparkContext.setJobDescription("er: blocking+pairs")
        keys, _hot = R.blocking_keys(reps_df, ngram=4, max_block=200)
        pairs = R.candidate_pairs(keys, rare_df=16)
        timed("er_pairs_only", lambda: _noop(pairs))
        spark.sparkContext.setJobDescription("er: scoring")
        scored = None

        def _score():
            nonlocal scored
            scored = R.score_pairs(pairs, reps_df, idf=idf,
                                   default_idf=default_idf,
                                   reject_below=0.65).localCheckpoint(
                                       eager=True)
        timed("er_score", _score)
        spark.sparkContext.setJobDescription("er: star+cc+labels")

        def _cc():
            star, labels = R._star_and_labels(prof, reps_df, scored, 0.65)
            _noop(labels)
        timed("er_cc_labels", _cc)
        spark.sparkContext.setJobDescription(None)

    if want("q27_phases"):
        import __spark_entry__ as em
        from metasra_pipeline_spark.er.resolution import connected_components

        edges_fn = em.__dict__["_event_edges"]
        spark.sparkContext.setJobDescription("q27: edges build")
        edges = edges_fn(spark, sf_dir).select(
            F.col("doc_a").cast("string").alias("doc_a"),
            F.col("doc_b").cast("string").alias("doc_b"))
        timed("q27_edges_only", lambda: _noop(edges))
        spark.sparkContext.setJobDescription("q27: cc")
        edges_ck = edges.localCheckpoint(eager=True)
        timed("q27_cc_only",
              lambda: _noop(connected_components(edges_ck)))
        spark.sparkContext.setJobDescription("q27: full")
        qs = em.queries()
        timed("q27_full", lambda: _noop(
            qs["q27_graph_components"](spark, sf_dir)))
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"metric": "bench_extra_seconds", "queries": timings,
                      "sf": sf_dir.rstrip("/").split("sf")[-1],
                      "cpus": int(cpus), "reps": reps}))


if __name__ == "__main__":
    main()
