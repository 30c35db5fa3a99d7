"""Capture .explain("formatted") output for the bench-timed queries plus
the headline pipelines' key frames.  Usage:

    python scripts/capture_plans.py <outdir> [suffix] [q ...]

Writes <outdir>/<name>_<suffix>.txt (suffix defaults to "after").
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_QUERIES = [
    "q01_pricing_summary", "q03_join_revenue", "q06_window_min",
    "q09_interval_containment", "q15_lsh_pairs", "q16_simhash",
    "q18_jaccard_pairs", "q21_knn_per_label", "q23_quality",
    "q27_graph_components", "q38_cosine_neardup", "q39_asof_join",
]


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    only = set(sys.argv[3:])
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from metasra_pipeline_spark.session import get_spark
    spark = get_spark("plan-capture", cores=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em
    qs = em.queries()

    def dump(name, df):
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")))
        print(f"wrote {path}", file=sys.stderr)

    for name in BENCH_QUERIES:
        if only and name not in only:
            continue
        dump(name, qs[name](spark, sf_dir))

    # headline pipelines: the frames whose plans the optimizations touch
    if not only or "er_scored" in only or "map_mapped_terms" in only:
        from pyspark.sql import functions as F

        from metasra_pipeline_spark.datagen import synth_documents
        from metasra_pipeline_spark.er import resolution as R

        docs = (synth_documents(spark, 2000, seed=43)
                .select("doc_id", "spans").localCheckpoint(eager=True))
        if not only or "er_scored" in only:
            prof = R.doc_profiles(docs).localCheckpoint(eager=True)
            idf, d_idf = R.token_idf(prof)
            reps = R.representative_profiles(prof).localCheckpoint(eager=True)
            keys, _hot = R.blocking_keys(reps, ngram=4, max_block=200)
            pairs = R.candidate_pairs(keys, rare_df=16)
            scored = R.score_pairs(pairs, reps, idf=idf, default_idf=d_idf,
                                   reject_below=0.65)
            dump("er_scored", scored)
        if not only or "map_mapped_terms" in only:
            from metasra_pipeline_spark.plans.pipeline import (
                run_mapping_pipeline,
            )
            from metasra_pipeline_spark.refdata import load_refdata
            ref = load_refdata(spark)
            mdocs = (synth_documents(spark, 200, seed=42)
                     .select("doc_id", "spans").localCheckpoint(eager=True))
            res = run_mapping_pipeline(spark, mdocs, ref)
            dump("map_mapped_terms", res.mapped_terms)


if __name__ == "__main__":
    main()
