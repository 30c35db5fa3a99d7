"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator surface over the driver's
testdata tables (TESTDATA.md), one entry per operator family from
SURVEY.md §2 plus the large-scale curation operators (dedup /
similarity-search / text-analysis / entity-resolution).  ``oracle_sql()``
holds the DuckDB-equivalent ANSI SQL; tokenization and hashing are
engine-portable by construction (regex splits + md5-derived hashes).

Queries q90/q91/q92 are non-SQL-expressible (IDF-kernel scoring +
iterative connected components on synthesized span documents, the full
p_53 mapping pipeline) and carry no oracle — the driver records
rows-only checks for them.  q93_er_native closes that gap for the ER
family: the same blocking→scoring→clustering pipeline in a
deterministic native-scorer configuration IS DuckDB-oracled hash-exact
(recursive-CTE transitive closure, explicit Winkler prefix boost).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from metasra_pipeline_spark.functions import dedup as D          # noqa: E402
from metasra_pipeline_spark.functions import simsearch as SS     # noqa: E402
from metasra_pipeline_spark.functions import textstats as TS     # noqa: E402

_TOK_RE = r"[^0-9a-z]+"

_LEXICON = [("scan", "op"), ("join", "op"), ("filter", "op"), ("sort", "op"),
            ("merge", "op"), ("window", "op"), ("hash", "op"), ("stream", "op")]
_FUZZY_LEX = ["scann", "joinn", "filtr", "sorrt", "mereg"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --------------------------------------------------------------------- entry
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the 4-table join + aggregation spine (scan → broadcast
    joins → partial agg) on sf0.001."""
    sf = "/root/testdata/sf0.001"
    return _q03_join_revenue(spark, sf)


# ----------------------------------------------------------------- relational
def _q01_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (li.where(F.col("l_shipdate") <= "1998-09-01")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity").alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.count("*").alias("count_order")))


def _q02_filter_project(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (li.where((F.col("l_quantity") < 5) & (F.col("l_discount") >= 0.05))
            .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount"))


def _q03_join_revenue(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (o.join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("n_name", "r_name")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue")))


def _q04_semi_join(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    return (o.join(c, o.o_custkey == c.c_custkey, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_orders")))


def _q05_anti_join(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_name"))


def _q06_window_min(spark, sf):
    from pyspark.sql import Window
    li = _t(spark, sf, "lineitem")
    w = Window.partitionBy("l_orderkey")
    return (li.withColumn("min_disc", F.min("l_discount").over(w))
            .where(F.col("l_discount") == F.col("min_disc"))
            .select("l_orderkey", "l_linenumber", "l_discount"))


def _q07_topk_per_group(spark, sf):
    from pyspark.sql import Window
    p = _t(spark, sf, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"),
                                              F.col("p_partkey"))
    return (p.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= 3)
            .select("p_brand", "p_partkey", "p_retailprice", "rk"))


def _q08_set_ops(spark, sf):
    c = _t(spark, sf, "customer")
    building = c.where("c_mktsegment = 'BUILDING'").select("c_custkey")
    machinery = c.where("c_mktsegment = 'MACHINERY'").select("c_custkey")
    lowbal = c.where("c_acctbal < 100").select("c_custkey")
    return building.union(machinery).distinct().exceptAll(lowbal.distinct())


def _q09_interval_containment(spark, sf):
    ev = _t(spark, sf, "events").select(
        "user_id", "event_id",
        F.col("value").alias("s"),
        (F.col("value") + F.length("event_type")).alias("e"))
    a, b = ev.alias("a"), ev.alias("b")
    return (a.join(b, on="user_id")
            .where((F.col("a.s") >= F.col("b.s"))
                   & (F.col("a.e") <= F.col("b.e"))
                   & ~((F.col("a.s") == F.col("b.s"))
                       & (F.col("a.e") == F.col("b.e")))
                   & (F.col("a.event_id") != F.col("b.event_id")))
            .groupBy("user_id")
            .agg(F.count("*").alias("n_contained")))


# ----------------------------------------------------- matching (J1/J2 shape)
def _q10_exact_lexicon(spark, sf):
    docs = _t(spark, sf, "documents")
    lex = spark.createDataFrame(_LEXICON, "term: string, category: string")
    toks = D.tokens(docs.select("doc_id", "text")).distinct()
    return (toks.join(F.broadcast(lex), toks.tok == lex.term)
            .groupBy("term")
            .agg(F.countDistinct("doc_id").alias("n_docs")))


def _q11_fuzzy_match(spark, sf):
    """Fuzzy match via the engine's real blocked-similarity-join
    mechanism (operators/stages.py:fuzzy_match): SymSpell-style deletion
    neighborhood keys → equi-join → levenshtein recheck.  Recall-exact
    for edit distance ≤ 1 (shared 1-deletion key), so the result equals
    the reference crossJoin formulation the oracle uses — without the
    all-pairs product that breaks at scale."""
    from pyspark.sql import Window

    from metasra_pipeline_spark.operators.stages import _deletion_keys_expr
    docs = _t(spark, sf, "documents")
    lex = (spark.createDataFrame([(t,) for t in _FUZZY_LEX], "term: string")
           .withColumn("lkey", F.explode(_deletion_keys_expr("term"))))
    toks = (D.tokens(docs.select("doc_id", "text")).select("tok").distinct()
            .where(F.length("tok").between(3, 12))
            .withColumn("qkey", F.explode(_deletion_keys_expr("tok"))))
    cand = (toks.join(F.broadcast(lex), toks.qkey == lex.lkey)
            .select("tok", "term").distinct()
            .withColumn("dist", F.levenshtein("tok", "term"))
            .where(F.col("dist") <= 1))
    w = Window.partitionBy("tok")
    return (cand.withColumn("min_d", F.min("dist").over(w))
            .where(F.col("dist") == F.col("min_d"))
            .select("tok", "term", "dist"))


def _q12_bigrams(spark, sf):
    docs = _t(spark, sf, "documents")
    ts = F.filter(F.split(F.lower("text"), _TOK_RE),
                  lambda t: F.length(t) > 0)
    bigrams = F.expr("transform(sequence(1, greatest(size(ts) - 1, 1)), "
                     "i -> concat(ts[i-1], ' ', ts[i]))")
    return (docs.select(ts.alias("ts"))
            .where(F.size("ts") >= 2)
            .select(F.explode(bigrams).alias("bigram"))
            .groupBy("bigram").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "bigram").limit(20))


# ------------------------------------------------------------------- dedup
def _q13_dedup_exact(spark, sf):
    return D.exact_dedup(_t(spark, sf, "documents"), "doc_id", "text")


def _q14_minhash(spark, sf):
    return D.minhash_signatures(_t(spark, sf, "documents"),
                                "doc_id", "text", k=8)


def _q15_lsh_pairs(spark, sf):
    sig = D.minhash_signatures(_t(spark, sf, "documents"),
                               "doc_id", "text", k=8)
    return D.lsh_candidate_pairs(sig, "doc_id", band_size=4)


def _q16_simhash(spark, sf):
    return D.simhash(_t(spark, sf, "documents"), "doc_id", "text", bits=16)


def _q17_fingerprint(spark, sf):
    return D.doc_fingerprint(_t(spark, sf, "documents"), "doc_id", "text",
                             shingle_words=3)


def _q18_jaccard_pairs(spark, sf):
    return D.jaccard_pairs(_t(spark, sf, "documents"), "doc_id", "text",
                           threshold=0.97, min_token_len=6, max_df=2000)


# --------------------------------------------------------- similarity search
def _query_vec(spark, sf):
    row = (_t(spark, sf, "embeddings").where("vec_id = 0")
           .select("embedding", "label").first())
    return [float(x) for x in row["embedding"]], int(row["label"])


def _q19_cosine_topk(spark, sf):
    q, _ = _query_vec(spark, sf)
    emb = _t(spark, sf, "embeddings").where("vec_id != 0")
    return SS.cosine_topk(emb, q, k=10)


def _q20_ivf_topk(spark, sf):
    q, lbl = _query_vec(spark, sf)
    emb = _t(spark, sf, "embeddings").where("vec_id != 0")
    return SS.ivf_topk(emb, q, query_label=lbl, k=5)


_LSH_BITS = 4
_LSH_RADIUS = 2
_LSH_DIM = 64  # embeddings table dim (TESTDATA.md), all SFs


def _lsh_list_id_sql(col: str) -> str:
    """DuckDB expression computing the SAME bucket id as
    simsearch.lsh_ivf_assign — identical seeded hyperplane literals,
    identical left-to-right double dot product."""
    from metasra_pipeline_spark.functions.simsearch import lsh_planes
    parts = []
    for j, p in enumerate(lsh_planes(_LSH_BITS, _LSH_DIM)):
        lit = "[" + ", ".join(repr(x) for x in p) + "]"
        parts.append(f"(CASE WHEN list_dot_product(CAST({col} AS "
                     f"DOUBLE[]), {lit}) >= 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(parts) + ")"


def _lsh_band_sql(col: str, band: int, band_bits: int = 2) -> str:
    """DuckDB expression for band ``band`` of the lsh_ivf_assign
    signature: the same seeded hyperplane literals restricted to bits
    [band*band_bits, (band+1)*band_bits) — the q38 banded blocking key."""
    from metasra_pipeline_spark.functions.simsearch import lsh_planes
    planes = lsh_planes(_LSH_BITS, _LSH_DIM)
    parts = []
    for i in range(band_bits):
        p = planes[band * band_bits + i]
        lit = "[" + ", ".join(repr(x) for x in p) + "]"
        parts.append(f"(CASE WHEN list_dot_product(CAST({col} AS "
                     f"DOUBLE[]), {lit}) >= 0 THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(parts) + ")"


def _q36_ivf_probe(spark, sf):
    """IVF ANN with a DETERMINISTIC coarse quantizer: multi-probe LSH
    (lsh_ivf_assign/lsh_ivf_probe — signed random projections, pure
    per-row arithmetic, bit-reproducible on any cluster layout; the
    k-means variant ivf_build/ivf_probe is pytest-verified with a
    tolerance recall test instead, because distributed k-means is not
    FP-combine-order deterministic).  The oracle re-implements the SAME
    index independently in DuckDB SQL (same seeded hyperplane literals)
    — a hash-exact dual-implementation check of bucketing + multi-probe
    schedule + within-bucket ranking; recall vs brute force is asserted
    separately in tests/test_dedup_simsearch.py."""
    q, _ = _query_vec(spark, sf)
    emb = _t(spark, sf, "embeddings").where("vec_id != 0")
    assigned, planes = SS.lsh_ivf_assign(emb, n_bits=_LSH_BITS)
    return SS.lsh_ivf_probe(assigned, planes, q, k=5, radius=_LSH_RADIUS)


def _q21_knn_per_label(spark, sf):
    emb = _t(spark, sf, "embeddings").where("label <= 2")
    return SS.knn_join_per_label(emb, k=2)


# ------------------------------------------------------------- text analysis
def _q22_token_stats(spark, sf):
    return TS.token_counts(_t(spark, sf, "documents"), "doc_id", "text")


def _q23_quality(spark, sf):
    return TS.quality_scores(_t(spark, sf, "documents"), "doc_id", "text")


#: deterministic per-lang marker suffix appended to the synthetic
#: documents (their text is English-ish token soup regardless of the
#: ``lang`` column), so the oracled q24 output exercises all four
#: stopword profiles AND the 'unknown' branch — mirrored verbatim in
#: the DuckDB oracle
_LANG_AUG_CASE = ("CASE lang"
                  " WHEN 'de' THEN repeat(' der die und das', 4)"
                  " WHEN 'fr' THEN repeat(' le les et est', 4)"
                  " WHEN 'es' THEN repeat(' el que los esta', 4)"
                  " ELSE '' END")


def _q24_lang_id(spark, sf):
    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(F.col("text"), F.expr(_LANG_AUG_CASE)).alias("text"))
    return (TS.lang_id(docs, "doc_id", "text")
            .groupBy("pred_lang").agg(F.count("*").alias("n_docs")))


def _q25_events_window(spark, sf):
    ev = _t(spark, sf, "events")
    return (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("window_start"),
                    "event_type", "n_events", "sum_value"))


def _q26_jw_pairs(spark, sf):
    """Jaro-Winkler scoring through the vectorized pandas-UDF kernel —
    cross-checked against DuckDB's native jaro_winkler_similarity."""
    from pyspark.sql.types import DoubleType

    from metasra_pipeline_spark.functions.similarity import jaro_winkler

    import math

    @F.pandas_udf(DoubleType())
    def jw(a: pd.Series, b: pd.Series) -> pd.Series:
        # floor-truncate: Python round() is banker's, DuckDB's is not
        return pd.Series([math.floor(jaro_winkler(x, y) * 1000) / 1000
                          for x, y in zip(a, b)])

    n = _t(spark, sf, "nation").select("n_name")
    a = n.select(F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_name").alias("name_b"))
    return (a.crossJoin(b).where(F.col("name_a") < F.col("name_b"))
            .select("name_a", "name_b", jw("name_a", "name_b").alias("jw")))


# -------------------------------------------------- ER (graph, recursive oracle)
def _event_edges(spark, sf):
    b = (_t(spark, sf, "events")
         .select("user_id", "event_type",
                 F.date_trunc("minute", "ts").alias("m")))
    a2, b2 = b.alias("a"), b.alias("b")
    return (a2.join(b2, on=["event_type", "m"])
            .where(F.col("a.user_id") < F.col("b.user_id"))
            .select(F.col("a.user_id").alias("doc_a"),
                    F.col("b.user_id").alias("doc_b"))
            .distinct())


def _q27_graph_components(spark, sf):
    from metasra_pipeline_spark.er.resolution import connected_components
    edges = _event_edges(spark, sf).select(
        F.col("doc_a").cast("string").alias("doc_a"),
        F.col("doc_b").cast("string").alias("doc_b"))
    labels = connected_components(edges)
    users = (_t(spark, sf, "events").select("user_id").distinct()
             .select(F.col("user_id").cast("string").alias("doc_id")))
    return (users.join(labels, on="doc_id", how="left")
            .select(F.col("doc_id").cast("bigint").alias("user_id"),
                    F.coalesce(F.col("cluster_id").cast("bigint"),
                               F.col("doc_id").cast("bigint"))
                    .alias("component_id")))


def _q28_blocking_keys(spark, sf):
    docs = _t(spark, sf, "documents")
    toks = D.tokens(docs.select("doc_id", "text")).distinct()
    return (toks.where(F.length("tok") >= 6)
            .groupBy(F.col("tok").alias("key"))
            .agg(F.countDistinct("doc_id").alias("n_docs")))


# ---------------------------------------- lexicon-build / output operators
def _q29_linked_terms(spark, sf):
    """J5 cross-ontology same-string linking (lexicon_build) over two
    string sets derived from the documents table (rare tokens only)."""
    from metasra_pipeline_spark.functions import dedup as _D
    from metasra_pipeline_spark.sources.lexicon_build import linked_terms_table
    toks = (_D.tokens(_t(spark, sf, "documents").select("doc_id", "text"))
            .where(F.length("tok") >= 8).distinct())
    a = (toks.where(F.col("doc_id") % 2 == 0)
         .select(F.concat(F.lit("A:"), "doc_id").alias("term_id"),
                 F.col("tok").alias("string")))
    b = (toks.where(F.col("doc_id") % 2 == 1)
         .select(F.concat(F.lit("B:"), "doc_id").alias("term_id"),
                 F.col("tok").alias("string")))
    return linked_terms_table(a, b)


def _q30_superterm_linked(spark, sf):
    """Superterm-linked-terms builder over a nation→region hierarchy."""
    from metasra_pipeline_spark.sources.lexicon_build import (
        superterm_linked_table,
    )
    n = _t(spark, sf, "nation")
    anc = n.select(F.concat(F.lit("N:"), "n_name").alias("term_id"),
                   F.concat(F.lit("R:"), "n_regionkey").alias("anc_id"))
    linked = (_t(spark, sf, "region")
              .select(F.concat(F.lit("R:"), "r_regionkey").alias("term_id"),
                      F.concat(F.lit("X:"), "r_name").alias("linked_id")))
    return superterm_linked_table(anc, linked)


def _q31_implications(spark, sf):
    """J6 implication mining: part-name token phrases imply their tokens."""
    from metasra_pipeline_spark.sources.lexicon_build import implications_table
    p = _t(spark, sf, "part").select(
        F.concat(F.lit("P:"), "p_partkey").alias("term_id"),
        F.lower("p_name").alias("name"))
    a_terms = (p.select(F.explode(F.split("name", " ")).alias("name"))
               .distinct()
               .select(F.concat(F.lit("A:"), "name").alias("term_id"), "name"))
    empty_syn = spark.createDataFrame(
        [], "term_id: string, syn_str: string, syn_type: string")
    return implications_table(a_terms, empty_syn, p, empty_syn)


def _q32_website_term_query(spark, sf):
    """A8 3-table build + website query-by-term read path."""
    from metasra_pipeline_spark.functions import dedup as _D
    from metasra_pipeline_spark.outputs import (
        build_metasra_tables,
        query_metasra_for_term,
    )
    docs = _t(spark, sf, "documents")
    lex = spark.createDataFrame(_LEXICON, "term: string, category: string")
    toks = _D.tokens(docs.select("doc_id", "text")).distinct()
    mapped = (toks.join(F.broadcast(lex), toks.tok == lex.term)
              .select(F.col("doc_id").cast("string").alias("doc_id"),
                      F.col("term").alias("term_id"), F.lit(False)
                      .alias("consequent")))
    rv = spark.createDataFrame(
        [], "doc_id: string, property_id: string, value: double, "
            "unit_id: string, consequent: boolean")
    types = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.when(F.col("n_chars") > 200, F.lit("tissue"))
         .otherwise(F.lit("cell_line")).alias("sample_type"),
        F.lit(0.9).alias("confidence"))
    t = build_metasra_tables(mapped, rv, types)
    return (query_metasra_for_term(t, "scan", sample_type="cell line")
            .select(F.col("sample_accession").cast("bigint")
                    .alias("sample_accession"),
                    "term_id", "sample_type", "confidence"))


def _q33_subgraph_slice(spark, sf):
    """Rooted ontology-subgraph slicing (descendants_or_self) over the
    orders→customer→nation→region hierarchy, rooted at region 0."""
    from metasra_pipeline_spark.sources.ontology_config import (
        descendants_or_self,
    )
    o = _t(spark, sf, "orders").select(
        F.concat(F.lit("O:"), "o_orderkey").alias("child_id"),
        F.concat(F.lit("C:"), "o_custkey").alias("parent_id"))
    c = _t(spark, sf, "customer").select(
        F.concat(F.lit("C:"), "c_custkey").alias("child_id"),
        F.concat(F.lit("N:"), "c_nationkey").alias("parent_id"))
    n = _t(spark, sf, "nation").select(
        F.concat(F.lit("N:"), "n_nationkey").alias("child_id"),
        F.concat(F.lit("R:"), "n_regionkey").alias("parent_id"))
    edges = (o.unionByName(c).unionByName(n)
             .withColumn("rel", F.lit("is_a")))
    return descendants_or_self(edges, ["R:0"])


_CVCL_SYN_SETS = [["nation_0", "nation_zero", "n0"],
                  ["nation_1", "nation_one"],
                  ["nation_7", "nation_seven", "n7"]]
_ATCC_KEYS = ["src1", "src7", "src13"]
_ATCC_VALS = ["de"]


def _q34_cellosaurus_synonyms(spark, sf):
    """T7 CellosaurusSynonyms_Stage via the real engine operator
    (operators/stages.py:cellosaurus_synonyms): tokens whose string is a
    synonym-set member derive every other member at the same interval."""
    from metasra_pipeline_spark.operators.stages import cellosaurus_synonyms
    from metasra_pipeline_spark.refdata import EMPTY_RAW, refdata_from_raw
    n = _t(spark, sf, "nation")
    tok = n.select(F.concat(F.lit("N:"), "n_nationkey").alias("doc_id"),
                   F.lower("n_name").alias("token"),
                   F.lit(0).alias("tstart"),
                   F.length("n_name").cast("int").alias("tend"))
    ref = refdata_from_raw(spark, {**EMPTY_RAW,
                                   "cvcl_syn_sets": _CVCL_SYN_SETS})
    out = cellosaurus_synonyms(
        tok.withColumnRenamed("tstart", "start")
           .withColumnRenamed("tend", "end"), ref)
    return (out.withColumnRenamed("start", "tstart")
            .withColumnRenamed("end", "tend"))


def _q35_atcc_filter(spark, sf):
    """F2 ATCCKeyValueFilter_Stage via the real engine operator
    (operators/stages.py:atcc_key_value_filter): broadcast anti-joins
    against the curated cell-line key/value blocklists."""
    from metasra_pipeline_spark.operators.stages import atcc_key_value_filter
    from metasra_pipeline_spark.refdata import EMPTY_RAW, refdata_from_raw
    d = _t(spark, sf, "documents")
    kv = d.select("doc_id", F.col("source").alias("key"),
                  F.col("lang").alias("value"))
    ref = refdata_from_raw(spark, {**EMPTY_RAW,
                                   "cell_line_filter_keys": _ATCC_KEYS,
                                   "cell_line_filter_values": _ATCC_VALS})
    return atcc_key_value_filter(kv, ref)


def _q37_media_decode(spark, sf):
    """Multimodal media columns through the REAL engine operators
    (functions/multimodal.py): extract_media_spans → decode_media
    (mapInPandas, Arrow batches; deterministic sha256-derived stub
    decoder — image/audio libs absent from this container) →
    frame_sample (native explode) → media_feature_stub (mapInPandas).
    The oracle recomputes the whole sha-derived metadata independently
    in DuckDB SQL — a full hash-match dual implementation; feature[0]
    is checked as its exact source byte (×255) to stay integer-exact
    across float32 storage."""
    from metasra_pipeline_spark.functions import multimodal as MM
    d = _t(spark, sf, "documents").where("doc_id % 10 < 3")
    ext = F.element_at(F.array(F.lit("png"), F.lit("wav"), F.lit("mp4")),
                       (F.col("doc_id") % 3 + 1).cast("int"))
    docs = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(F.lit("text").alias("kind"),
                     F.col("text").alias("text"),
                     F.lit("").alias("media_ref"), F.lit(0).alias("offset")),
            F.struct(F.lit("media").alias("kind"), F.lit("").alias("text"),
                     F.concat(F.lit("bucket/"), F.col("doc_id"), F.lit("."),
                              ext).alias("media_ref"),
                     F.lit(1).alias("offset")),
        ).alias("spans"))
    media = MM.extract_media_spans(docs)
    dec = MM.decode_media(media)
    fs = (MM.frame_sample(dec, every_n=8)
          .groupBy("doc_id", "media_ref")
          .agg(F.count("*").cast("int").alias("n_sampled_frames")))
    feat = (MM.media_feature_stub(dec, dim=8)
            .select("doc_id", "media_ref",
                    F.round(F.element_at("feature", 1) * 255, 0)
                    .cast("int").alias("feat_byte0")))
    return (dec
            .join(fs, on=["doc_id", "media_ref"], how="left")
            .join(feat, on=["doc_id", "media_ref"])
            .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                    "media_ref", "media_kind", "content_sha",
                    "width", "height", "n_frames", "duration_ms",
                    F.coalesce("n_sampled_frames", F.lit(0))
                    .alias("n_sampled_frames"),
                    "feat_byte0"))


_NEARDUP_TAU = 0.4      # min |cosine-tau| over ALL pairs is >=1.2e-4 at
_NEARDUP_CAP = 100000   # sf0.001/sf0.01 (measured) — boundary-safe


def _q38_cosine_neardup(spark, sf):
    """Embedding-cosine near-duplicate detection (dedup family): banded
    hyperplane-LSH blocking (OR over 2 bands x 2 bits of the q36 seeded
    signature) -> exact cosine on candidates only -> pairs >= tau.
    The oracle re-implements the identical banded index + cap + cosine
    independently in DuckDB (same hyperplane literals) — a hash-exact
    dual-implementation check like q36; the tau margin making the
    threshold FP-safe is asserted in tests/test_dedup_simsearch.py."""
    emb = _t(spark, sf, "embeddings")
    return D.cosine_near_dup_pairs(emb, threshold=_NEARDUP_TAU,
                                   n_bits=_LSH_BITS, band_bits=2,
                                   max_bucket=_NEARDUP_CAP)


def _q39_asof_join(spark, sf):
    """Backward as-of join (functions/asof.py): each click event gets
    the same user's most recent at-or-before view event.  Spark side is
    the sort-merge union+window composition (one shuffle by user_id —
    no range-join blowup); the oracle is DuckDB's NATIVE ASOF LEFT
    JOIN, so two independent as-of implementations must agree
    hash-exact, gap measured in integer microseconds (FP-free)."""
    from metasra_pipeline_spark.functions.asof import asof_join
    ev = _t(spark, sf, "events")
    clicks = ev.where("event_type = 'click'").select(
        "event_id", "user_id", "ts")
    views = ev.where("event_type = 'view'").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id"))
    out = asof_join(clicks, views, on="user_id", ts="ts",
                    payload=["view_event_id"])
    return out.select("event_id", "user_id", "view_event_id",
                      F.col("asof_gap_us").alias("gap_us"))


def _q40_most_specific(spark, sf):
    """A6 most_specific_terms (ontology_graph.py:251-290) through the
    REAL consolidation operator: per-doc term sets over the
    customer→nation→region hierarchy; a term is dropped iff one of its
    descendants is also in the doc's set (anti-join against
    mapped ⋈ ancestors).  Only every third customer contributes its
    leaf C-term, so some N-terms survive (no descendant present) while
    others are suppressed — both branches exercised."""
    from types import SimpleNamespace

    from metasra_pipeline_spark.operators.consolidate import (
        most_specific_terms,
    )
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    cn = c.join(n, c.c_nationkey == n.n_nationkey)
    doc = (F.col("c_custkey") % 25).alias("doc_id")
    leaf = cn.where(F.col("c_custkey") % 3 == 0)
    mapped = (leaf.select(doc, F.concat(F.lit("C:"), "c_custkey")
                          .alias("term_id"))
              .unionByName(cn.select(doc, F.concat(F.lit("N:"),
                                                   "c_nationkey")
                                     .alias("term_id")))
              .unionByName(cn.select(doc, F.concat(F.lit("R:"),
                                                   "n_regionkey")
                                     .alias("term_id")))
              .distinct())
    anc = (leaf.select(F.concat(F.lit("C:"), "c_custkey").alias("term_id"),
                       F.concat(F.lit("N:"), "c_nationkey").alias("anc_id"))
           .unionByName(leaf.select(
               F.concat(F.lit("C:"), "c_custkey").alias("term_id"),
               F.concat(F.lit("R:"), "n_regionkey").alias("anc_id")))
           .unionByName(n.select(
               F.concat(F.lit("N:"), "n_nationkey").alias("term_id"),
               F.concat(F.lit("R:"), "n_regionkey").alias("anc_id")))
           .distinct())
    ref = SimpleNamespace(ancestors=anc)
    return (most_specific_terms(mapped, ref)
            .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                    "term_id"))


def _tok_intervals(spark, sf):
    """Distinct (doc_id, tok, start, end) with each token's
    first-occurrence interval in the lowered text (instr is 1-based, as
    is DuckDB strpos)."""
    docs = _t(spark, sf, "documents")
    toks = D.tokens(docs.select("doc_id", "text")).distinct()
    lt = docs.select("doc_id", F.lower("text").alias("_lt"))
    return (toks.join(lt, on="doc_id")
            .select("doc_id", "tok",
                    (F.expr("instr(_lt, tok)") - 1).alias("start"))
            .withColumn("end", (F.col("start") + F.length("tok"))
                        .cast("int"))
            .withColumn("start", F.col("start").cast("int")))


def _q41_exact_over_fuzzy(spark, sf):
    """P1 PrioritizeExactMatchOverFuzzyMatch
    (pipeline_components.py:549-601) through the REAL precedence
    operator: match edges built by the engine's deletion-neighborhood
    fuzzy join (recall-exact for edit distance ≤1), grouped by origin
    interval; a group holding any exact edge drops its fuzzy edges.
    Tokens like 'scan' carry both an exact edge and a dist-1 edge to
    'scann' (suppressed); pure-fuzzy tokens keep theirs — both branches
    exercised."""
    from metasra_pipeline_spark.operators.precedence import (
        prioritize_exact_over_fuzzy,
    )
    from metasra_pipeline_spark.operators.stages import _deletion_keys_expr
    terms = [t for t, _ in _LEXICON] + _FUZZY_LEX
    lex = (spark.createDataFrame([(t,) for t in terms], "term: string")
           .withColumn("lkey", F.explode(_deletion_keys_expr("term"))))
    toks = (_tok_intervals(spark, sf)
            .withColumn("qkey", F.explode(_deletion_keys_expr("tok"))))
    matches = (toks.join(F.broadcast(lex), toks.qkey == lex.lkey)
               .select("doc_id", "tok", "start", "end", "term").distinct()
               .withColumn("edit_dist", F.levenshtein("tok", "term"))
               .where(F.col("edit_dist") <= 1)
               .drop("tok"))
    return prioritize_exact_over_fuzzy(matches).select(
        "doc_id", "start", "end", "term", "edit_dist")


def _q42_priority_filter(spark, sf):
    """P2 FilterOntologyMatchesByPriority_Stage
    (pipeline_components.py:693-751) through the REAL operator: per
    (token interval, term id-space), a direct match (TERM_NAME /
    EXACT_SYNONYM / ENRICHED_SYNONYM) suppresses that interval's
    inexact-synonym matches in the same space; other spaces and NP:
    custom targets are untouched.  Even-length terms get an A-space
    direct edge (its A-space inexact edge must vanish), odd-length
    terms don't (theirs must survive); B-space inexact edges and NP:
    rows always survive."""
    from metasra_pipeline_spark.operators.precedence import (
        filter_matches_by_priority,
    )
    lex = spark.createDataFrame([(t,) for t, _ in _LEXICON], "term: string")
    hits = (_tok_intervals(spark, sf)
            .join(F.broadcast(lex), F.col("tok") == F.col("term"))
            .select("doc_id", F.col("tok").alias("token"), "start", "end",
                    "term"))
    even = F.length("term") % 2 == 0
    a_direct = (hits.where(even)
                .select("doc_id", "token", "start", "end",
                        F.concat(F.lit("A:"), "term").alias("target_id"),
                        F.lit("TERM_NAME").alias("match_target")))
    a_inexact = hits.select(
        "doc_id", "token", "start", "end",
        F.concat(F.lit("A:"), "term", F.lit(":syn")).alias("target_id"),
        F.lit("INEXACT_SYNONYM").alias("match_target"))
    b_inexact = hits.select(
        "doc_id", "token", "start", "end",
        F.concat(F.lit("B:"), "term").alias("target_id"),
        F.lit("INEXACT_SYNONYM").alias("match_target"))
    np_rows = (hits.where(~even)
               .select("doc_id", "token", "start", "end",
                       F.concat(F.lit("NP:"), "term").alias("target_id"),
                       F.lit("INEXACT_SYNONYM").alias("match_target")))
    matches = (a_direct.unionByName(a_inexact).unionByName(b_inexact)
               .unionByName(np_rows))
    return filter_matches_by_priority(matches).select(
        "doc_id", "token", "start", "end", "target_id", "match_target")


def _q43_dev_stage_from_age(spark, sf):
    """I6 ImpliedDevelopmentalStageFromAge_Stage
    (pipeline_components.py:1503-1514) through the REAL inference
    operator: real-value rows synthesized from `events` (age property /
    year unit / value gates all exercised); adult docs (> 18 years)
    gain EFO:0001272 + UBERON:0007023 inference edges."""
    from metasra_pipeline_spark.operators.inference import (
        implied_developmental_stage,
    )
    ev = _t(spark, sf, "events")
    rv = ev.select(
        F.col("user_id").alias("doc_id"),
        F.when(F.col("event_id") % 2 == 0, "EFO:0000246")
         .otherwise("EFO:0000721").alias("property_id"),
        F.when(F.col("event_id") % 3 != 0, "UO:0000036")
         .otherwise("UO:0000035").alias("unit_id"),
        (F.col("value") % 50).alias("value"))
    return implied_developmental_stage(rv)


def _q44_ancestor_closure(spark, sf):
    """A5 superterm closure (run_pipeline.py:98-103) through the REAL
    consolidation operator: per-doc term sets over the
    customer→nation→region hierarchy (q40's derivation) with a
    deterministic consequent flag; ancestors inherit the child's flag
    and groupBy-min keeps an explicit False over any inherited True."""
    from types import SimpleNamespace

    from metasra_pipeline_spark.operators.consolidate import (
        add_ancestor_closure,
    )
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    cn = c.join(n, c.c_nationkey == n.n_nationkey)
    doc = (F.col("c_custkey") % 25).alias("doc_id")
    leaf = cn.where(F.col("c_custkey") % 3 == 0)
    mapped = (leaf.select(doc, F.concat(F.lit("C:"), "c_custkey")
                          .alias("term_id"))
              .unionByName(cn.select(doc, F.concat(F.lit("N:"),
                                                   "c_nationkey")
                                     .alias("term_id")))
              .distinct()
              .withColumn("consequent",
                          F.split("term_id", ":").getItem(1)
                          .cast("int") % 2 == 0))
    anc = (leaf.select(F.concat(F.lit("C:"), "c_custkey").alias("term_id"),
                       F.concat(F.lit("N:"), "c_nationkey").alias("anc_id"))
           .unionByName(leaf.select(
               F.concat(F.lit("C:"), "c_custkey").alias("term_id"),
               F.concat(F.lit("R:"), "n_regionkey").alias("anc_id")))
           .unionByName(n.select(
               F.concat(F.lit("N:"), "n_nationkey").alias("term_id"),
               F.concat(F.lit("R:"), "n_regionkey").alias("anc_id")))
           .distinct())
    ref = SimpleNamespace(ancestors=anc,
                          mappable_prefixes={"C", "N", "R"})
    return (add_ancestor_closure(mapped, ref)
            .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                    "term_id",
                    F.col("consequent").cast("int").alias("consequent")))


def _q45_time_unit_parse(spark, sf):
    """T10 ParseTimeWithUnit_Stage (pipeline_components.py:1341-1429)
    through the REAL stage operator: kv/token/match frames synthesized
    deterministically from `documents` doc ids.  Only docs whose key
    token matched a time-typed target (even ids) get their value-side
    tokens parsed into value + unit + expanded-unit-synonym tokens;
    odd docs and non-parsing tokens pass through untouched."""
    from types import SimpleNamespace

    from metasra_pipeline_spark.operators.stages import parse_time_with_unit
    docs = _t(spark, sf, "documents").select("doc_id")
    kv = docs.select("doc_id",
                     F.lit(0).alias("key_start"), F.lit(3).alias("key_end"),
                     F.lit(10).alias("val_start"), F.lit(40).alias("val_end"))
    v1 = F.concat((F.col("doc_id") % 97).cast("string"), F.lit("h"))
    v2 = F.concat((F.col("doc_id") % 13).cast("string"), F.lit("min"))
    tok = (docs.select("doc_id", F.lit("age").alias("token"),
                       F.lit(0).alias("start"), F.lit(3).alias("end"))
           .unionByName(docs.select(
               "doc_id", v1.alias("token"), F.lit(10).alias("start"),
               (F.lit(10) + F.length(v1)).cast("int").alias("end")))
           .unionByName(docs.select(
               "doc_id", v2.alias("token"), F.lit(20).alias("start"),
               (F.lit(20) + F.length(v2)).cast("int").alias("end")))
           .unionByName(docs.select(
               "doc_id", F.lit("plain").alias("token"),
               F.lit(30).alias("start"), F.lit(35).alias("end"))))
    matches = (docs.where(F.col("doc_id") % 2 == 0)
               .select("doc_id", F.lit(0).alias("start"),
                       F.lit(3).alias("end"),
                       F.lit("EFO:TIME").alias("target_id")))
    ref = SimpleNamespace(time_keys=["EFO:TIME"])
    out = parse_time_with_unit(kv, tok, matches, ref, spark)
    return out.select("doc_id", "token", "start", "end")


def _q46_real_value_extraction(spark, sf):
    """R1 ExtractRealValue_Stage (pipeline_components.py:1199-1338)
    through the REAL inference operator, every branch exercised:
    property-id preference folding (721→724 keeps a double-matched key
    from tripping the guard), the exactly-one-property guard (d%9 docs
    match two distinct props → suppressed), key-side property via the
    inference-edge hop (d%3==1 reaches PROP:BMI through X:SEED),
    numeric-token extraction with a non-numeric decoy, and the
    0/1/many-unit cascade (one unit → that unit; none → per-property
    default or 'missing'; two → null)."""
    from types import SimpleNamespace

    from metasra_pipeline_spark.operators.inference import extract_real_values
    d = _t(spark, sf, "documents").select("doc_id")
    kv = d.select(
        "doc_id", F.lit("age").alias("key"),
        F.concat(F.lit("v"), F.col("doc_id").cast("string")).alias("value"),
        F.lit(0).alias("key_start"), F.lit(3).alias("key_end"),
        F.lit(10).alias("val_start"), F.lit(40).alias("val_end"))
    t1 = (F.col("doc_id") % 50).cast("string")
    t2 = (F.col("doc_id") % 7).cast("string")
    tok = (d.select("doc_id", t1.alias("token"), F.lit(10).alias("start"),
                    (F.lit(10) + F.length(t1)).cast("int").alias("end"))
           .unionByName(d.select(
               "doc_id", F.lit("foo").alias("token"),
               F.lit(15).alias("start"), F.lit(18).alias("end")))
           .unionByName(d.where(F.col("doc_id") % 4 == 0).select(
               "doc_id", t2.alias("token"), F.lit(20).alias("start"),
               (F.lit(20) + F.length(t2)).cast("int").alias("end"))))

    def _m(cond, s, e, tid):
        return d.where(cond).select(
            "doc_id", F.lit(s).alias("start"), F.lit(e).alias("end"),
            F.lit(tid).alias("target_id"))

    did = F.col("doc_id")
    matches = (_m(did % 3 == 0, 0, 3, "EFO:0000724")
               .unionByName(_m(did % 6 == 0, 0, 3, "EFO:0000721"))
               .unionByName(_m(did % 9 == 0, 0, 3, "PROP:BMI"))
               .unionByName(_m(did % 3 == 1, 0, 3, "X:SEED"))
               .unionByName(_m(did % 2 == 0, 25, 28, "UO:0000036"))
               .unionByName(_m(did % 8 == 0, 30, 33, "UO:0000035")))
    inf_edges = d.where(did % 3 == 1).select(
        "doc_id", F.lit("X:SEED").alias("src_id"),
        F.lit("PROP:BMI").alias("dst_id"))
    ref = SimpleNamespace(
        real_val_props=spark.createDataFrame(
            [("EFO:0000724",), ("EFO:0000721",), ("PROP:BMI",)],
            "property_id: string"),
        default_units=spark.createDataFrame(
            [("EFO:0000724", "UO:0000032")],
            "property_id: string, unit_id: string"))
    return extract_real_values(kv, tok, matches, inf_edges, ref)


#: Inline inference lookups mirrored verbatim into the q47 oracle VALUES
#: (the fixture role run_pipeline.py's curated JSON overlays play).
_IMPLIED_DISEASE = [("CVCL:0000", "DOID:0001"), ("CVCL:0002", "DOID:0002"),
                    ("CVCL:0002", "DOID:0022"), ("CVCL:0004", "DOID:0004")]
_CONSEQUENT_TERMS = [("T:3", "CONS:A"), ("T:7", "CONS:B"),
                     ("T:7", "CONS:B2"), ("CVCL:0004", "CONS:C")]
_CVCL_TERMS = [("CVCL:0000", "UBERON:0001"), ("CVCL:0000", "DOID:0001"),
               ("CVCL:0006", "CL:0099"), ("CVCL:0008", "EFO:0042")]
_CVCL_REAL_VALS = [("CVCL:0000", "EFO:0000246", 42.0, "UO:0000036"),
                   ("CVCL:0006", "PROP:BMI", 21.5, "UO:0000032")]


def _q47_terms(spark, sf):
    """Deterministic per-doc term sets: every doc holds T:<doc_id%20>;
    even docs additionally hold CVCL:000<doc_id%10> (an id-space the
    inference stages key on)."""
    d = _t(spark, sf, "documents").select("doc_id")
    base = d.select("doc_id", F.concat(F.lit("T:"),
                                       (F.col("doc_id") % 20).cast("string"))
                    .alias("term_id"))
    cvcl = (d.where(F.col("doc_id") % 2 == 0)
            .select("doc_id", F.concat(
                F.lit("CVCL:000"),
                (F.col("doc_id") % 10).cast("string")).alias("term_id")))
    return base.unionByName(cvcl)


def _q47_inference_edges(spark, sf):
    """I2 CellLineToImpliedDisease (pipeline_components.py:1109-1128),
    I3 CustomConsequentTerms (:1436-1455), I4 ConsequentCulturedCell
    (:1481-1500) and I5 InferCellLineTerms (:1517-1537) through the
    REAL inference operators over a deterministic per-doc term set and
    inline curated lookups; I5's inferred real-value rows are folded in
    as rv-typed edges so both halves of its output are pinned."""
    from types import SimpleNamespace

    from metasra_pipeline_spark.operators.inference import (
        cell_line_to_implied_disease,
        consequent_cultured_cell,
        custom_consequent_terms,
        infer_cell_line_terms,
    )
    terms = _q47_terms(spark, sf)
    ref = SimpleNamespace(
        implied_disease=spark.createDataFrame(
            _IMPLIED_DISEASE, "term_id: string, implied_id: string"),
        consequent_terms=spark.createDataFrame(
            _CONSEQUENT_TERMS, "term_id: string, conseq_id: string"),
        cvcl_terms=spark.createDataFrame(
            _CVCL_TERMS, "cvcl_id: string, mapped_id: string"),
        cvcl_real_vals=spark.createDataFrame(
            _CVCL_REAL_VALS,
            "cvcl_id: string, property_id: string, value: double, "
            "unit_id: string"))
    i2 = cell_line_to_implied_disease(terms, ref)
    i3 = custom_consequent_terms(terms, ref)
    i4 = consequent_cultured_cell(terms)
    i5_edges, i5_rvs = infer_cell_line_terms(terms, ref)
    rv_as_edges = i5_rvs.select(
        "doc_id", "src_id",
        F.concat("property_id", F.lit("="),
                 F.format_number("value", 1), F.lit("|"),
                 "unit_id").alias("dst_id"),
        F.lit("rv").alias("itype"))
    return (i2.unionByName(i3).unionByName(i4).unionByName(i5_edges)
            .unionByName(rv_as_edges)
            .select("doc_id", "src_id", "dst_id", "itype").distinct())


#: J3 two-char whitelist / J4 noun-phrase targets, mirrored into q48's
#: oracle VALUES.  Entries chosen to actually occur in the sf corpus.
_TWO_CHAR = [("of", "T:OF"), ("to", "T:TO"), ("in", "T:IN1"),
             ("in", "T:IN2")]
_NOUN_PHRASES = ["the", "data", "with", "analysis"]


def _q48_custom_matches(spark, sf):
    """J3 TwoCharMappings_Stage (pipeline_components.py:298-320) and J4
    ExactMatchCustomTargets_Stage (:1089-1106) through the REAL match
    operators over the corpus token intervals; a multi-target two-char
    token (`in`) and the NP: id-space prefix are both exercised."""
    from types import SimpleNamespace

    from metasra_pipeline_spark.operators.stages import (
        noun_phrase_match,
        two_char_match,
    )
    tok = _tok_intervals(spark, sf).withColumnRenamed("tok", "token")
    ref = SimpleNamespace(
        two_char=spark.createDataFrame(_TWO_CHAR,
                                       "token: string, term_id: string"),
        noun_phrases=spark.createDataFrame([(p,) for p in _NOUN_PHRASES],
                                           "phrase: string"))
    j3 = two_char_match(tok, ref)
    j4 = noun_phrase_match(tok, ref)
    return (j3.unionByName(j4)
            .select("doc_id", "token", "start", "end", "target_id",
                    "match_target"))


#: F1 key/value blocklists, mirrored into q49's oracle VALUES.
_FILTER_KEYS = ["biomaterial provider", "lab", "id"]
_FILTER_VALUES = ["missing", "n/a", "not applicable"]


def _q49_kv(spark, sf):
    """Deterministic kv frame with running char intervals: each doc
    carries (key cycling through a small curated list incl. blocklisted
    ones, value = its own source field or a blocklisted literal)."""
    d = _t(spark, sf, "documents").select("doc_id", "source")
    key = F.element_at(
        F.array(F.lit("tissue"), F.lit("lab"), F.lit("age"),
                F.lit("id"), F.lit("strain")),
        (F.col("doc_id") % 5 + 1).cast("int"))
    val = F.when(F.col("doc_id") % 7 == 0, F.lit("missing")) \
           .when(F.col("doc_id") % 11 == 0, F.lit("n/a")) \
           .otherwise(F.col("source"))
    kv = d.select("doc_id", key.alias("key"), val.alias("value"))
    return kv.select(
        "doc_id", "key", "value",
        F.lit(0).alias("key_start"),
        F.length("key").cast("int").alias("key_end"),
        (F.length("key") + 2).cast("int").alias("val_start"),
        (F.length("key") + 2 + F.length("value")).cast("int")
        .alias("val_end"))


def _q49_filter_init_tokens(spark, sf):
    """F1 KeyValueFilter_Stage (pipeline_components.py:264-295) + F3
    InitKeyValueTokens_Stage (:238-261) through the REAL stage
    operators: blocklisted keys (`lab`, `id`) and values (`missing`,
    `n/a`) drop their kv pairs; survivors emit one key token and one
    value token carrying the running char intervals."""
    from types import SimpleNamespace

    from metasra_pipeline_spark.operators.stages import (
        init_tokens,
        key_value_filter,
    )
    kv = _q49_kv(spark, sf)
    ref = SimpleNamespace(
        filter_keys=spark.createDataFrame([(k,) for k in _FILTER_KEYS],
                                          "key: string"),
        filter_values=spark.createDataFrame([(v,) for v in _FILTER_VALUES],
                                            "value: string"))
    return init_tokens(key_value_filter(kv, ref)).select(
        "doc_id", "token", "start", "end")


def _q50_blocked_matches(spark, sf):
    """P4 BlockCellLineNonCellLineKey_Stage
    (pipeline_components.py:464-546) through the REAL precedence
    operator: per doc, two kv pairs (kv1 keyed cell-line-typed on d%3==0
    docs via an EFO:0000322 key match, kv2 always generic); CVCL:0077 in
    kv1's value is protected inside a cell-line kv (d%6==0) but deleted
    when kv1 is generic (d%2==0, d%3!=0); CVCL:0088 in kv2's value is
    always triggered and never protected; the non-cell-line UBERON match
    is untouched."""
    from metasra_pipeline_spark.operators.precedence import (
        block_cell_line_matches,
    )
    d = _t(spark, sf, "documents").select("doc_id")
    did = F.col("doc_id")
    kv = (d.select("doc_id", F.lit(0).alias("key_start"),
                   F.lit(8).alias("key_end"), F.lit(10).alias("val_start"),
                   F.lit(30).alias("val_end"))
          .unionByName(d.select(
              "doc_id", F.lit(40).alias("key_start"),
              F.lit(45).alias("key_end"), F.lit(50).alias("val_start"),
              F.lit(70).alias("val_end"))))

    def _m(cond, s, e, tid):
        return d.where(cond).select(
            "doc_id", F.lit(s).alias("start"), F.lit(e).alias("end"),
            F.lit(tid).alias("target_id"))

    matches = (_m(did % 3 == 0, 0, 8, "EFO:0000322")
               .unionByName(_m(did % 2 == 0, 10, 18, "CVCL:0077"))
               .unionByName(_m(did % 5 == 0, 50, 58, "CVCL:0088"))
               .unionByName(_m(did >= 0, 12, 20, "UBERON:0002")))
    cl_terms = spark.createDataFrame([("CVCL:0077",), ("CVCL:0088",)],
                                     "term_id: string")
    return block_cell_line_matches(
        kv, matches, ["EFO:0000322", "EFO:0000324"], cl_terms).select(
        "doc_id", "start", "end", "target_id")


#: I7 combination fixtures, mirrored into q51's oracle VALUES.
#: (combo_id, required_term, n_required_artifacts, consequent_term)
_COMBO_REQUIRED = [("C1", "T:1", 1, "CONS:X"), ("C1", "T:2", 1, "CONS:X"),
                   ("C2", "T:0", 2, "CONS:Y")]
#: (combo_id, artifact_set_id, artifact) — artifacts are common corpus
#: tokens so coverage varies per doc.
_COMBO_ARTIFACTS = [("C1", "S1", "the"), ("C1", "S1", "of"),
                    ("C2", "S1", "data"), ("C2", "S2", "with"),
                    ("C2", "S2", "for")]


def _q51_artifact_combos(spark, sf):
    """I7 TermArtifactCombinations_Stage (pipeline_components.py:951-1009)
    through the REAL inference operator: a doc fires a combo iff it holds
    every required term AND tokens from >= n_required_artifacts distinct
    artifact sets; one edge per required term node.  Term sets T:(d%4) +
    T:(d%5) make the two-required-term combo C1 fire only on docs where
    the pair {T:1, T:2} co-occurs; C2 needs both its artifact sets
    covered."""
    from types import SimpleNamespace

    from metasra_pipeline_spark.operators.inference import (
        term_artifact_combinations,
    )
    d = _t(spark, sf, "documents").select("doc_id")
    terms = (d.select("doc_id", F.concat(
                F.lit("T:"), (F.col("doc_id") % 4).cast("string"))
                .alias("term_id"))
             .unionByName(d.select("doc_id", F.concat(
                 F.lit("T:"), (F.col("doc_id") % 5).cast("string"))
                 .alias("term_id")))
             .distinct())
    tok = (_t(spark, sf, "documents")
           .select("doc_id", F.explode(F.split(F.lower("text"),
                                               _TOK_RE)).alias("token"))
           .where(F.length("token") > 0))
    ref = SimpleNamespace(
        combo_required_terms=spark.createDataFrame(
            _COMBO_REQUIRED,
            "combo_id: string, required_term: string, "
            "n_required_artifacts: int, consequent_term: string"),
        combo_artifacts=spark.createDataFrame(
            _COMBO_ARTIFACTS,
            "combo_id: string, artifact_set_id: string, artifact: string"))
    return term_artifact_combinations(tok, terms, ref).select(
        "doc_id", "src_id", "dst_id", "itype")


def _q52_consolidate_flags(spark, sf):
    """A2 consequent flag + A3 real-value-property exclusion + A4
    mappable filter (+ the seed/closure reachability they act on)
    through the REAL consolidate operator (run_pipeline.py:75-121,
    pipeline_components.py:132-230): NP: targets never emit; RV:-source
    edges seed their dst; a consequent-only chain (T -> CONS -> DEEP)
    stays consequent=true at depth 2; a non-consequent in-edge flips
    EXP:2 to explicit; an edge from an unreachable GHOST source emits
    nothing; T:7 is blacklisted; (doc, T:0) pairs acting as real-value
    properties are excluded."""
    from types import SimpleNamespace

    from metasra_pipeline_spark.operators.consolidate import consolidate
    d = _t(spark, sf, "documents").select("doc_id")
    did = F.col("doc_id")
    t_term = F.concat(F.lit("T:"), (did % 8).cast("string"))
    matches = (d.select("doc_id", t_term.alias("target_id"))
               .unionByName(d.where(did % 2 == 0).select(
                   "doc_id", F.concat(F.lit("CVCL:000"),
                                      (did % 10).cast("string"))
                   .alias("target_id")))
               .unionByName(d.select(
                   "doc_id", F.lit("NP:foo").alias("target_id"))))

    def _e(cond, src, dst, itype):
        return d.where(cond).select(
            "doc_id", src.alias("src_id"), dst.alias("dst_id"),
            F.lit(itype).alias("itype"))

    cons = F.concat(F.lit("CONS:"), (did % 3).cast("string"))
    inf_edges = (
        _e(did % 2 == 0, t_term, cons, "Custom consequent term")
        .unionByName(_e(did % 3 == 0, cons, F.lit("DEEP:1"),
                        "Linked term of superterm"))
        .unionByName(_e(did % 5 == 0, t_term, F.lit("EXP:2"), "Derived"))
        .unionByName(_e(did % 7 == 0, F.lit("RV:EFO:0000246"),
                        F.lit("RVT:9"), "Infer developmental stage"))
        .unionByName(_e(did % 9 == 0, F.lit("GHOST:1"), F.lit("NOWHERE:5"),
                        "Custom consequent term")))
    real_values = d.where(did % 16 == 0).select(
        "doc_id", F.lit("T:0").alias("property_id"))
    ref = SimpleNamespace(
        mappable_prefixes=["T", "CONS", "DEEP", "CVCL", "RVT", "EXP",
                           "NOWHERE"],
        nonmappable_terms=["T:7"])
    return consolidate(matches, inf_edges, real_values, ref,
                       with_provenance=False).select(
        "doc_id", "term_id", F.col("consequent").cast("int")
        .alias("consequent"))


def _q53_provenance(spark, sf):
    """A1 term_provenance (the flattened reverse-Dijkstra analogue,
    pipeline_components.py:132-230 + text_reasoning_graph.py:465-516)
    through the REAL consolidation operator: per (doc, term), the
    minimum-depth kv-anchored path with the reference's tie order
    (depth, key_start, match start).  Branches: a term matched under
    two kv pairs (key_start tie-break), an inference dst reachable from
    two sources at equal depth (start tie-break), an RV:-source edge
    inheriting the property term's provenance, and a depth-2 chain."""
    from metasra_pipeline_spark.operators.consolidate import term_provenance
    d = _t(spark, sf, "documents").select("doc_id")
    did = F.col("doc_id")
    kv = (d.select("doc_id", F.lit("age").alias("key"),
                   F.concat(F.lit("v"), did.cast("string")).alias("value"),
                   F.lit(0).alias("key_start"), F.lit(3).alias("key_end"),
                   F.lit(10).alias("val_start"), F.lit(40).alias("val_end"))
          .unionByName(d.select(
              "doc_id", F.lit("tissue").alias("key"),
              F.concat(F.lit("w"), did.cast("string")).alias("value"),
              F.lit(50).alias("key_start"), F.lit(56).alias("key_end"),
              F.lit(60).alias("val_start"), F.lit(90).alias("val_end"))))

    def _m(cond, tok, s, e, tid, mt, ed):
        return d.where(cond).select(
            "doc_id", F.lit(tok).alias("token"), F.lit(s).alias("start"),
            F.lit(e).alias("end"), F.lit(tid).alias("target_id"),
            F.lit(mt).alias("match_target"), F.lit(ed).alias("edit_dist"))

    matches = (_m(did >= 0, "age", 0, 3, "T:KEY", "TERM_NAME", 0)
               .unionByName(_m(did % 2 == 0, "x", 12, 13, "T:VAL",
                               "EXACT_SYNONYM", 1))
               .unionByName(_m(did % 3 == 0, "tissue", 50, 56, "T:KEY",
                               "TERM_NAME", 0)))

    def _e(cond, src, dst, itype):
        return d.where(cond).select(
            "doc_id", F.lit(src).alias("src_id"), F.lit(dst).alias("dst_id"),
            F.lit(itype).alias("itype"))

    inf_edges = (_e(did % 2 == 0, "T:VAL", "I:1", "Custom consequent term")
                 .unionByName(_e(did % 4 == 0, "T:KEY", "I:1",
                                 "Linked term of superterm"))
                 .unionByName(_e(did % 5 == 0, "RV:T:KEY", "R:2",
                                 "Infer developmental stage"))
                 .unionByName(_e(did % 3 == 0, "I:1", "DEEP:3",
                                 "Custom consequent term")))
    return term_provenance(matches, inf_edges, kv).select(
        "doc_id", "term_id", "orig_key", "orig_val",
        F.array_join("mapping_path", " > ").alias("path"))


def _q54_expansion_edges(spark, sf):
    """T2 Lowercase / T3 Delimit(+ _ - /) / T4 inflectional / T5
    spelling / T6 synonym / T8 acronym stages through the REAL fused
    expansion operator (run_pipeline.py:182-192; the one-pass
    snapshot-ordered closure of pipeline_components.py:323-690):
    derivation edges with doc-absolute intervals.  Branches: an initcap
    token lowercased then inflected, a mixed-case underscore token
    split from BOTH case variants (the already-lowercase part arrives
    via two parents), a spelling variant of a split part, hyphen /
    plus / slash splits, and a synonym + acronym expansion of a split
    part.  T1 n-grams contribute nothing by construction (single-word
    tokens), pinning the stage's no-op branch."""
    from types import SimpleNamespace

    from metasra_pipeline_spark.operators.stages import expansion_edges
    d = _t(spark, sf, "documents").select("doc_id")
    did = F.col("doc_id")
    k = (did % 3).cast("string")
    a = (did % 7).cast("string")
    b = (did % 5).cast("string")
    t1 = F.concat(F.lit("Gene"), k)
    t2 = F.concat(F.lit("Ab"), k, F.lit("_beta"), b)
    t3 = F.concat(F.lit("alpha"), a, F.lit("-beta"), b)
    t4 = F.concat(F.lit("alpha"), a, F.lit("+cd4"))
    t5 = F.concat(F.lit("alpha"), a, F.lit("/beta"), b)

    def _tok(expr, s):
        return d.select("doc_id", expr.alias("token"),
                        F.lit(s).alias("start"),
                        (F.lit(s) + F.length(expr)).cast("int").alias("end"))

    tok = (_tok(t1, 0).unionByName(_tok(t2, 10)).unionByName(_tok(t3, 30))
           .unionByName(_tok(t4, 50)).unionByName(_tok(t5, 70)))
    ref = SimpleNamespace(raw={
        "syn_sets": [["cd4", "tcell"]],
        "acronyms": {"cd4": ["cluster of differentiation 4"]},
        "inflection_variants": {f"gene{i}": [f"genes{i}"]
                                for i in range(3)},
        "spelling_variants": {f"ab{i}": [f"aybee{i}"] for i in range(3)},
    })
    return expansion_edges(tok, ref).select(
        "doc_id", "ptoken", "pstart", "pend", "token", "start", "end",
        "kind")


def _q55_classifier_grams(spark, sf):
    """C1/C2 per-field uni+bigram featurization
    (learn_classifier.py:231-244) through the REAL featurizer: grams
    never span two attributes, delimiters `_ / -` become spaces,
    length<=1 tokens and stop-grams drop, and a doc whose every field
    degenerates (len-1 token + stop word) keeps a zero-gram row — the
    branch that protects prediction denominators.  Output is the
    deterministic (doc, gram, n) count projection of the grams list."""
    from metasra_pipeline_spark.functions.classifier import doc_field_grams
    d = _t(spark, sf, "documents")
    did = F.col("doc_id")
    deg = d.where(did % 13 == 0).select(
        "doc_id", F.lit("a").alias("key"), F.lit("of").alias("value"))
    rest = (d.where(did % 13 != 0)
            .select("doc_id", F.lit("cell_type").alias("key"),
                    F.col("text").alias("value"))
            .unionByName(d.where(did % 13 != 0).select(
                "doc_id", F.lit("age-of.donor").alias("key"),
                F.col("source").alias("value"))))
    kv = deg.unionByName(rest)
    return (doc_field_grams(kv)
            .select("doc_id", F.explode_outer("grams").alias("gram"))
            .withColumn("gram", F.coalesce("gram", F.lit("")))
            .groupBy("doc_id", "gram").agg(F.count("*").alias("n")))


def _q56_rule_overrides(spark, sf):
    """C5 domain-rule overrides + C6 renormalize/argmax
    (one_vs_rest_classifier_same_features.py:185-272) through the REAL
    rule operators (_rule_flags + apply_rule_overrides) over synthetic
    probability vectors: xenograft precedence, passage-number tissue /
    primary-cells zeroing, Cellosaurus-subset masks (a doc whose
    subsets jointly zero every type), the stem/cell-type/primary flags,
    and the all-zeroed no-renormalize branch."""
    from metasra_pipeline_spark.functions.classifier import (
        SAMPLE_TYPES,
        _rule_flags,
        apply_rule_overrides,
    )
    label_list = sorted(SAMPLE_TYPES)
    d = _t(spark, sf, "documents").select("doc_id")
    did = F.col("doc_id")
    kv = d.select("doc_id", F.lit("k").alias("key"),
                  F.lit("v").alias("value"))

    def _mt(cond, tid):
        return d.where(cond).select("doc_id", F.lit(tid).alias("term_id"))

    mapped = (_mt(did % 11 == 0, "EFO:0003942")
              .unionByName(_mt(did % 4 == 0, "CL:0000034"))
              .unionByName(_mt(did % 6 == 0, "CL:0002371"))
              .unionByName(_mt(did % 5 == 0, "CL:0000001"))
              .unionByName(_mt(did % 3 == 0, "CVCL:A"))
              .unionByName(_mt(did % 9 == 0, "CVCL:B")))
    rv = (d.where(did % 2 == 0)
          .select("doc_id", F.lit("EFO:0007061").alias("property_id"),
                  F.lit("UO:0000189").alias("unit_id"),
                  ((did % 3) - 1).cast("double").alias("value"))
          .unionByName(d.select(
              "doc_id", F.lit("EFO:0000246").alias("property_id"),
              F.lit("UO:0000036").alias("unit_id"),
              F.lit(30.0).alias("value"))))
    subsets = spark.createDataFrame(
        [("CVCL:A", "Cancer_cell_line"), ("CVCL:B", "Embryonic_stem_cell"),
         ("CVCL:A", "Unknown_subset")], "cvcl_id: string, subset: string")
    probs = d.select("doc_id", F.array(*[
        (((did * 7 + i * 13) % 19) + 1).cast("double")
        for i in range(len(label_list))]).alias("probs"))
    pred = probs.join(_rule_flags(kv, mapped, rv, subsets),
                      on="doc_id", how="left")
    return apply_rule_overrides(pred, label_list)


def _er_span_docs(spark, sf):
    """Interleaved span documents (input_hint shape) synthesized
    deterministically from the sf `documents` table — shared corpus for
    q90/q92/q93."""
    return _t(spark, sf, "documents").select(
        F.concat(F.lit("D"), F.lpad("doc_id", 8, "0")).alias("doc_id"),
        F.array(
            F.struct(F.lit("text").alias("kind"),
                     F.concat(F.lit("content: "), F.col("text")).alias("text"),
                     F.lit("").alias("media_ref"),
                     F.lit(0).alias("offset")),
            F.struct(F.lit("text").alias("kind"),
                     F.concat(F.lit("source: "), F.col("source")).alias("text"),
                     F.lit("").alias("media_ref"),
                     F.lit(1).alias("offset")),
        ).alias("spans"))


def _q93_er_native(spark, sf):
    """ER with the native-only scorer (resolve_entities_native): the
    whole blocking→scoring→threshold→connected-components pipeline is
    DuckDB-oracled hash-exact — blocking keys, hot-key cap,
    meta-blocking, the 0.65·jaccard + 0.15·lev-ratio + 0.2·JW composite
    (explicit Winkler prefix boost in SQL), the id-conflict cap, exact-
    dup star edges, and a recursive-CTE transitive closure."""
    from metasra_pipeline_spark.er.resolution import resolve_entities_native
    docs = _er_span_docs(spark, sf)
    return (resolve_entities_native(spark, docs)["clusters"]
            .select("doc_id", "cluster_id"))


def _q94_er_incremental_native(spark, sf):
    """INCREMENTAL ER, DuckDB-oracled hash-exact: resolve the base 75 %
    of the corpus with the native scorer, land the remaining 25 % via
    incremental_resolve(scorer="native"), and return the full updated
    assignment with labels canonicalized to each cluster's min doc_id
    (pure relabeling — the partition is untouched).

    The oracle does NOT shortcut to a batch run: it independently
    re-derives the INCREMENTAL semantics — base-phase edges with the
    hot-key cap judged on base-only counts, delta-phase pairs (≥1 new
    endpoint) with the cap judged on combined counts, exact-profile
    attach edges, dup star edges on both sides — then takes one
    recursive-CTE transitive closure over the union.  The split is
    arithmetic on the doc_id suffix so both engines compute it
    identically."""
    from metasra_pipeline_spark.er.incremental import incremental_resolve
    from metasra_pipeline_spark.er.resolution import resolve_entities_native
    docs = _er_span_docs(spark, sf)
    part = F.expr("cast(substring(doc_id, 2, 8) as int) % 4")
    base = docs.where(part < 3)
    delta = docs.where(part == 3)
    base_res = resolve_entities_native(spark, base)
    res = incremental_resolve(
        spark, base_profiles=base_res["profiles"],
        base_clusters=base_res["clusters"],
        new_documents=delta, ngram=0, scorer="native")
    clusters = res["clusters"]
    canon = (clusters.groupBy("cluster_id")
             .agg(F.min("doc_id").alias("canon")))
    return (clusters.join(canon, on="cluster_id")
            .select("doc_id", F.col("canon").alias("cluster_id")))


# ------------------------------------------- non-SQL-expressible (rows-only)
def _q90_er_resolve(spark, sf):
    """Full blocking→scoring→CC entity resolution over span documents
    synthesized deterministically from the sf `documents` table."""
    from metasra_pipeline_spark.er.resolution import resolve_entities
    return resolve_entities(spark, _er_span_docs(spark, sf))["clusters"]


def _q92_er_incremental(spark, sf):
    """Incremental ER (the landed-batch delta path): resolve the base
    75% of the q90 corpus, land the remaining 25% via
    incremental_resolve, return the full updated assignment.  Oracle is
    the pytest equivalence suite (tests/test_er_incremental.py pins
    partition equality with the full batch run)."""
    from metasra_pipeline_spark.er.incremental import incremental_resolve
    from metasra_pipeline_spark.er.resolution import resolve_entities
    docs = _er_span_docs(spark, sf)
    base = docs.where(F.pmod(F.hash("doc_id"), F.lit(4)) < 3)
    delta = docs.where(F.pmod(F.hash("doc_id"), F.lit(4)) == 3)
    base_res = resolve_entities(spark, base)
    return incremental_resolve(
        spark, base_profiles=base_res["profiles"],
        base_clusters=base_res["clusters"],
        new_documents=delta)["clusters"]


def _q91_mapping_pipeline(spark, sf):
    """The p_53 semantic mapping pipeline end-to-end on bundled fixture
    documents (sf-independent; oracle is the pytest golden suite, which
    pins the same docs' term sets / real values / provenance).  The
    fixture set covers every stage family the golden suite exercises:
    T10 time parsing (g2/g7/g9), T9 property synonyms (g6), I6 dev-stage
    from age, I7 term-artifact combos (g3/g8), the I2-I5 cell-line
    cascade + R1 default-unit branch (g4/g12), and P4 blocking (g5)."""
    from metasra_pipeline_spark.datagen import docs_from_kv
    from metasra_pipeline_spark.plans.pipeline import run_mapping_pipeline
    from metasra_pipeline_spark.refdata import load_refdata
    ref = load_refdata(spark)
    docs = docs_from_kv(spark, [
        ("g1", [("ID", "P352_141"), ("age", "48"), ("bmi", "24"),
                ("gender", "female"),
                ("source_name", "vastus lateralis muscle_female"),
                ("tissue", "vastus lateralis muscle")]),
        ("g2", [("age", "7 Year old"), ("batch", "1L"),
                ("condition", "Disomic"), ("gender", "female"),
                ("source_name", "Lymphoblastoid")]),
        ("g3", [("cell type", "T cell"), ("marker", "CD4+")]),
        ("g4", [("cell line", "MDA-MB-231"), ("passage", "3")]),
        ("g5", [("treatment", "HeLa conditioned medium")]),
        ("g6", [("sex", "m"), ("tissue", "liver")]),
        ("g7", [("age", "6 weeks"), ("tissue", "heart")]),
        ("g8", [("cell type", "T cell"), ("marker", "CD8+")]),
        ("g9", [("timepoint", "4 hour"), ("source_name", "Lymphoblastoid")]),
        ("g10", [("tissue", "bone marrow"), ("age", "62"), ("bmi", "31")]),
        ("g11", [("gender", "male"), ("tissue", "brain")]),
        ("g12", [("cell line", "HeLa"), ("passage", "7")]),
        ("g13", [("cell line", "MDA-MB-231"), ("condition",
                 "TNF stimulated 6h")]),          # second full cascade
        ("g14", [("gender", "male"), ("tissue", "skin"),
                 ("age", "25"), ("bmi", "22")]),
    ])
    res = run_mapping_pipeline(spark, docs, ref)
    # The driver sort-canonicalizes every column with pandas; an
    # array<string> column is unhashable there, so flatten mapping_path.
    return res.mapped_terms.withColumn(
        "mapping_path", F.concat_ws("→", F.col("mapping_path")))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_summary": _q01_pricing_summary,
        "q02_filter_project": _q02_filter_project,
        "q03_join_revenue": _q03_join_revenue,
        "q04_semi_join": _q04_semi_join,
        "q05_anti_join": _q05_anti_join,
        "q06_window_min": _q06_window_min,
        "q07_topk_per_group": _q07_topk_per_group,
        "q08_set_ops": _q08_set_ops,
        "q09_interval_containment": _q09_interval_containment,
        "q10_exact_lexicon": _q10_exact_lexicon,
        "q11_fuzzy_match": _q11_fuzzy_match,
        "q12_bigrams": _q12_bigrams,
        "q13_dedup_exact": _q13_dedup_exact,
        "q14_minhash": _q14_minhash,
        "q15_lsh_pairs": _q15_lsh_pairs,
        "q16_simhash": _q16_simhash,
        "q17_fingerprint": _q17_fingerprint,
        "q18_jaccard_pairs": _q18_jaccard_pairs,
        "q19_cosine_topk": _q19_cosine_topk,
        "q20_ivf_topk": _q20_ivf_topk,
        "q21_knn_per_label": _q21_knn_per_label,
        "q22_token_stats": _q22_token_stats,
        "q23_quality": _q23_quality,
        "q24_lang_id": _q24_lang_id,
        "q25_events_window": _q25_events_window,
        "q26_jw_pairs": _q26_jw_pairs,
        "q27_graph_components": _q27_graph_components,
        "q28_blocking_keys": _q28_blocking_keys,
        "q29_linked_terms": _q29_linked_terms,
        "q30_superterm_linked": _q30_superterm_linked,
        "q31_implications": _q31_implications,
        "q32_website_term_query": _q32_website_term_query,
        "q33_subgraph_slice": _q33_subgraph_slice,
        "q34_cellosaurus_synonyms": _q34_cellosaurus_synonyms,
        "q35_atcc_filter": _q35_atcc_filter,
        "q36_ivf_probe": _q36_ivf_probe,
        "q37_media_decode": _q37_media_decode,
        "q38_cosine_neardup": _q38_cosine_neardup,
        "q39_asof_join": _q39_asof_join,
        "q40_most_specific": _q40_most_specific,
        "q41_exact_over_fuzzy": _q41_exact_over_fuzzy,
        "q42_priority_filter": _q42_priority_filter,
        "q43_dev_stage_from_age": _q43_dev_stage_from_age,
        "q44_ancestor_closure": _q44_ancestor_closure,
        "q45_time_unit_parse": _q45_time_unit_parse,
        "q46_real_value_extraction": _q46_real_value_extraction,
        "q47_inference_edges": _q47_inference_edges,
        "q48_custom_matches": _q48_custom_matches,
        "q49_filter_init_tokens": _q49_filter_init_tokens,
        "q50_block_cell_line": _q50_blocked_matches,
        "q51_artifact_combos": _q51_artifact_combos,
        "q52_consolidate_flags": _q52_consolidate_flags,
        "q53_provenance": _q53_provenance,
        "q54_expansion_edges": _q54_expansion_edges,
        "q55_classifier_grams": _q55_classifier_grams,
        "q56_rule_overrides": _q56_rule_overrides,
        "q93_er_native": _q93_er_native,
        "q94_er_incremental_native": _q94_er_incremental_native,
        "q90_er_resolve": _q90_er_resolve,
        "q92_er_incremental": _q92_er_incremental,
        "q91_mapping_pipeline": _q91_mapping_pipeline,
    }


# --------------------------------------------------------------------- oracle
_TOKS_CTE = (
    "toks AS (SELECT doc_id, unnest(list_filter("
    "regexp_split_to_array(lower(text), '[^0-9a-z]+'), t -> len(t) > 0)) "
    "AS tok FROM documents)"
)
_H = ("CAST(concat('0x', substring(md5({x}), 1, 15)) AS BIGINT)")


def _cvcl_syn_vals() -> str:
    return ", ".join(f"({i}, '{m}')"
                     for i, s in enumerate(_CVCL_SYN_SETS) for m in s)


_ATCC_KEYS_SQL = ", ".join(f"'{k}'" for k in _ATCC_KEYS)
_ATCC_VALS_SQL = ", ".join(f"'{v}'" for v in _ATCC_VALS)


def _er_stop_sql() -> str:
    from metasra_pipeline_spark.er.resolution import _STOPWORDS
    return ", ".join("'" + w.replace("'", "''") + "'"
                     for w in sorted(_STOPWORDS))


_ER_STOP_SQL = _er_stop_sql()


def _er_score_chain_sql(p: str, cand: str, reps: str) -> str:
    """CTE chain replicating er/resolution.py's native scorer
    (score_pairs with idf=None, reject_below=None) in DuckDB SQL:
    exact-token Jaccard (j0, prefilter >= 0.2), levenshtein ratio on
    profiles, the 0.65/0.15/0.2 composite with an explicit Winkler
    prefix boost (similarity.py:50-57), the JW short-circuit
    (partial + 0.2 < 0.60 never evaluates JW — resolution.py:419),
    and the numeric-id-conflict cap at 0.60 (similarity.py:176,193).
    Emits CTEs ``{p}sc0..{p}sc3`` and ``{p}edges`` (threshold 0.65)
    reading candidates from ``{cand}`` (doc_a, doc_b) and profiles
    from ``{reps}`` (doc_id, profile, toks).  Shared verbatim by the
    q93 batch oracle and BOTH phases of the q94 incremental oracle,
    so the three scoring chains cannot drift apart."""
    return f"""
            {p}sc0 AS (
              SELECT c.doc_a, c.doc_b,
                     ra.profile AS pa, rb.profile AS pb,
                     ra.toks AS ta, rb.toks AS tb,
                     CAST(len(list_intersect(ra.toks, rb.toks)) AS DOUBLE)
                       / len(list_distinct(list_concat(ra.toks, rb.toks)))
                       AS j0
              FROM {cand} c
              JOIN {reps} ra ON c.doc_a = ra.doc_id
              JOIN {reps} rb ON c.doc_b = rb.doc_id),
            {p}sc1 AS (
              SELECT *,
                     CASE WHEN greatest(len(pa), len(pb)) = 0 THEN 1.0
                          ELSE 1.0 - levenshtein(pa, pb)
                               / CAST(greatest(len(pa), len(pb)) AS DOUBLE)
                     END AS lr
              FROM {p}sc0 WHERE j0 >= 0.2),
            {p}sc2 AS (
              SELECT *, 0.65 * j0 + 0.15 * lr AS partial,
                     jaro_similarity(pa, pb) AS jaro,
                     CASE WHEN substr(pa, 1, 4) = substr(pb, 1, 4) THEN 4
                          WHEN substr(pa, 1, 3) = substr(pb, 1, 3) THEN 3
                          WHEN substr(pa, 1, 2) = substr(pb, 1, 2) THEN 2
                          WHEN substr(pa, 1, 1) = substr(pb, 1, 1) THEN 1
                          ELSE 0 END AS prefix,
                     (len(list_filter(ta, t -> NOT list_contains(tb, t)
                            AND regexp_matches(t, '[0-9]'))) > 0
                      AND len(list_filter(tb, t -> NOT list_contains(ta, t)
                            AND regexp_matches(t, '[0-9]'))) > 0)
                       AS conflict
              FROM {p}sc1),
            {p}sc3 AS (
              SELECT doc_a, doc_b,
                     CASE WHEN partial + 0.2 >= 0.60
                          THEN partial + 0.2 * (jaro + prefix * 0.1
                                                * (1.0 - jaro))
                          ELSE partial END AS full_score, conflict
              FROM {p}sc2),
            {p}edges AS (
              SELECT doc_a, doc_b FROM {p}sc3
              WHERE (CASE WHEN full_score > 0.60 AND conflict THEN 0.60
                          ELSE full_score END) >= 0.65)"""


def oracle_sql() -> dict[str, str]:
    lex_vals = ", ".join(f"('{t}', '{c}')" for t, c in _LEXICON)
    flex_vals = ", ".join(f"('{t}')" for t in _FUZZY_LEX)
    en = "'the','and','of','to','in','is'"
    de = "'der','die','und','das','nicht','ist'"
    fr = "'le','la','et','les','des','est'"
    es = "'el','la','de','que','los','es'"
    stop = ("'the','a','an','and','or','of','to','in','is','on','for',"
            "'with'")
    return {
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                     AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= '1998-09-01'
            GROUP BY l_returnflag, l_linestatus""",
        "q02_filter_project": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_discount
            FROM lineitem WHERE l_quantity < 5 AND l_discount >= 0.05""",
        "q03_join_revenue": """
            SELECT n_name, r_name, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY n_name, r_name""",
        "q04_semi_join": """
            SELECT o_orderpriority, count(*) AS n_orders FROM orders
            WHERE EXISTS (SELECT 1 FROM customer
                          WHERE c_custkey = o_custkey
                            AND c_mktsegment = 'BUILDING')
            GROUP BY o_orderpriority""",
        "q05_anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey)""",
        "q06_window_min": """
            SELECT l_orderkey, l_linenumber, l_discount FROM (
              SELECT l_orderkey, l_linenumber, l_discount,
                     min(l_discount) OVER (PARTITION BY l_orderkey) AS md
              FROM lineitem) WHERE l_discount = md""",
        "q07_topk_per_group": """
            SELECT p_brand, p_partkey, p_retailprice, rk FROM (
              SELECT p_brand, p_partkey, p_retailprice,
                     row_number() OVER (PARTITION BY p_brand
                       ORDER BY p_retailprice DESC, p_partkey) AS rk
              FROM part) WHERE rk <= 3""",
        "q08_set_ops": """
            SELECT c_custkey FROM (
              SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
              UNION
              SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
            EXCEPT
            SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal < 100""",
        "q09_interval_containment": """
            WITH iv AS (SELECT user_id, event_id, value AS s,
                               value + len(event_type) AS e FROM events)
            SELECT a.user_id AS user_id, count(*) AS n_contained
            FROM iv a JOIN iv b ON a.user_id = b.user_id
            WHERE a.s >= b.s AND a.e <= b.e
              AND NOT (a.s = b.s AND a.e = b.e)
              AND a.event_id != b.event_id
            GROUP BY a.user_id""",
        "q10_exact_lexicon": f"""
            WITH {_TOKS_CTE},
            lex(term, category) AS (VALUES {lex_vals})
            SELECT term, count(DISTINCT doc_id) AS n_docs
            FROM (SELECT DISTINCT doc_id, tok FROM toks) t
            JOIN lex ON t.tok = lex.term GROUP BY term""",
        "q11_fuzzy_match": f"""
            WITH {_TOKS_CTE},
            dt AS (SELECT DISTINCT tok FROM toks
                   WHERE len(tok) BETWEEN 3 AND 12),
            lex(term) AS (VALUES {flex_vals}),
            cand AS (SELECT tok, term, levenshtein(tok, term) AS dist
                     FROM dt CROSS JOIN lex
                     WHERE levenshtein(tok, term) <= 1)
            SELECT tok, term, dist FROM (
              SELECT tok, term, dist,
                     min(dist) OVER (PARTITION BY tok) AS md FROM cand)
            WHERE dist = md""",
        "q12_bigrams": """
            WITH ts AS (SELECT list_filter(
                   regexp_split_to_array(lower(text), '[^0-9a-z]+'),
                   t -> len(t) > 0) AS ts FROM documents),
            bg AS (SELECT unnest(list_transform(range(1, len(ts)),
                       i -> ts[i] || ' ' || ts[i+1])) AS bigram
                   FROM ts WHERE len(ts) >= 2)
            SELECT bigram, count(*) AS n FROM bg GROUP BY bigram
            ORDER BY n DESC, bigram LIMIT 20""",
        "q13_dedup_exact": """
            SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id,
                   count(*) AS n_copies
            FROM documents GROUP BY md5(text)""",
        "q14_minhash": f"""
            WITH {_TOKS_CTE},
            dt AS (SELECT DISTINCT doc_id, tok FROM toks),
            hx AS (SELECT doc_id, h_idx, tok,
                          {_H.format(x="concat(h_idx, '|', tok)")} AS h
                   FROM dt CROSS JOIN (SELECT unnest(range(0, 8)) AS h_idx))
            SELECT doc_id, CAST(h_idx AS INT) AS h_idx,
                   min(h) AS minhash
            FROM hx GROUP BY doc_id, h_idx""",
        "q15_lsh_pairs": f"""
            WITH {_TOKS_CTE},
            dt AS (SELECT DISTINCT doc_id, tok FROM toks),
            hx AS (SELECT doc_id, h_idx, tok,
                          {_H.format(x="concat(h_idx, '|', tok)")} AS h
                   FROM dt CROSS JOIN (SELECT unnest(range(0, 8)) AS h_idx)),
            sig AS (SELECT doc_id, h_idx, min(h) AS minhash
                    FROM hx GROUP BY doc_id, h_idx),
            banded AS (SELECT doc_id, CAST(h_idx // 4 AS INT) AS band,
                              md5(array_to_string(list_sort(
                                list(concat(h_idx, ':', minhash))), ','))
                                AS bucket
                       FROM sig GROUP BY doc_id, h_idx // 4),
            ok AS (SELECT band, bucket FROM banded
                   GROUP BY band, bucket HAVING count(*) <= 1000)
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bucket = b.bucket
            JOIN ok ON a.band = ok.band AND a.bucket = ok.bucket
            WHERE a.doc_id < b.doc_id""",
        "q16_simhash": f"""
            WITH {_TOKS_CTE},
            hx AS (SELECT doc_id, {_H.format(x="tok")} AS h FROM toks),
            votes AS (SELECT doc_id, bit,
                             sum(CASE WHEN (h >> bit) & 1 = 1
                                      THEN 1 ELSE -1 END) AS v
                      FROM hx CROSS JOIN
                        (SELECT CAST(unnest(range(0, 16)) AS INT) AS bit)
                      GROUP BY doc_id, bit)
            SELECT doc_id,
                   CAST(sum(CASE WHEN v > 0
                            THEN CAST(1 AS BIGINT) << bit ELSE 0 END)
                        AS BIGINT) AS simhash
            FROM votes GROUP BY doc_id""",
        "q17_fingerprint": f"""
            WITH ts AS (SELECT doc_id, list_filter(
                   regexp_split_to_array(lower(text), '[^0-9a-z]+'),
                   t -> len(t) > 0) AS ts FROM documents),
            sh AS (SELECT doc_id, unnest(list_transform(
                       range(1, greatest(len(ts) - 2, 1) + 1),
                       i -> array_to_string(list_slice(ts, i, i + 2), ' ')))
                       AS shingle FROM ts)
            SELECT doc_id, min({_H.format(x="shingle")}) AS fingerprint
            FROM sh GROUP BY doc_id""",
        "q18_jaccard_pairs": f"""
            WITH {_TOKS_CTE},
            dt AS (SELECT DISTINCT doc_id, tok FROM toks),
            sizes AS (SELECT doc_id, count(*) AS n_toks
                      FROM dt GROUP BY doc_id),
            kdf AS (SELECT tok, count(DISTINCT doc_id) AS df FROM dt
                    WHERE len(tok) >= 6 GROUP BY tok),
            keys AS (SELECT doc_id, dt.tok FROM dt
                     JOIN kdf ON dt.tok = kdf.tok
                     WHERE len(dt.tok) >= 6 AND kdf.df <= 2000),
            cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                     FROM keys a JOIN keys b ON a.tok = b.tok
                     WHERE a.doc_id < b.doc_id),
            inter AS (SELECT c.id_a, c.id_b, count(*) AS n_inter
                      FROM cand c
                      JOIN dt x ON x.doc_id = c.id_a
                      JOIN dt y ON y.doc_id = c.id_b AND y.tok = x.tok
                      GROUP BY c.id_a, c.id_b)
            SELECT i.id_a, i.id_b,
                   round(CAST(n_inter AS DOUBLE)
                         / (sa.n_toks + sb.n_toks - n_inter), 4) AS jac
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.id_a
            JOIN sizes sb ON sb.doc_id = i.id_b
            WHERE CAST(n_inter AS DOUBLE)
                  / (sa.n_toks + sb.n_toks - n_inter) >= 0.97""",
        "q19_cosine_topk": """
            SELECT e.vec_id,
                   round(list_cosine_similarity(
                     CAST(e.embedding AS DOUBLE[]),
                     CAST(q.embedding AS DOUBLE[])), 4) AS cosine
            FROM embeddings e,
                 (SELECT embedding FROM embeddings WHERE vec_id = 0) q
            WHERE e.vec_id != 0
            ORDER BY cosine DESC, e.vec_id LIMIT 10""",
        "q20_ivf_topk": """
            SELECT e.vec_id,
                   round(list_cosine_similarity(
                     CAST(e.embedding AS DOUBLE[]),
                     CAST(q.embedding AS DOUBLE[])), 4) AS cosine
            FROM embeddings e,
                 (SELECT embedding, label FROM embeddings WHERE vec_id = 0) q
            WHERE e.vec_id != 0 AND e.label = q.label
            ORDER BY cosine DESC, e.vec_id LIMIT 5""",
        "q21_knn_per_label": """
            WITH p AS (
              SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
                     round(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 4) AS cosine
              FROM embeddings a JOIN embeddings b
                ON a.label = b.label AND a.vec_id < b.vec_id
              WHERE a.label <= 2 AND b.label <= 2)
            SELECT label, id_a, id_b, cosine, rk AS rank FROM (
              SELECT *, row_number() OVER (PARTITION BY label, id_a
                        ORDER BY cosine DESC, id_b) AS rk FROM p)
            WHERE rk <= 2""",
        "q22_token_stats": """
            WITH ts AS (SELECT doc_id, length(text) AS n_chars, list_filter(
                   regexp_split_to_array(lower(text), '[^0-9a-z]+'),
                   t -> len(t) > 0) AS ts FROM documents)
            SELECT doc_id, len(ts) AS n_ws_tokens,
                   CAST(list_sum(list_transform(ts,
                        t -> CAST(ceil(len(t) / 4.0) AS INT))) AS INT)
                     AS n_subword_est,
                   n_chars
            FROM ts""",
        "q23_quality": f"""
            WITH {_TOKS_CTE},
            agg AS (SELECT doc_id, count(*) AS n,
                           sum(len(tok)) / CAST(count(*) AS DOUBLE)
                             AS avg_len,
                           sum(CASE WHEN tok IN ({stop})
                                    THEN 1 ELSE 0 END)
                             / CAST(count(*) AS DOUBLE) AS sr
                    FROM toks GROUP BY doc_id)
            SELECT doc_id, n AS n_tokens,
                   floor(avg_len * 10000) / 10000 AS avg_token_len,
                   floor(sr * 10000) / 10000 AS stopword_ratio,
                   floor((least(n / 50.0, 1.0) * 0.4
                          + least(avg_len / 6.0, 1.0) * 0.3
                          + least(sr * 5, 1.0) * 0.3) * 10000) / 10000
                     AS quality
            FROM agg WHERE n > 0""",
        "q24_lang_id": f"""
            WITH aug AS (SELECT doc_id,
                   text || {_LANG_AUG_CASE} AS text FROM documents),
            ts AS (SELECT doc_id, list_filter(
                   regexp_split_to_array(lower(text), '[^0-9a-z]+'),
                   t -> len(t) > 0) AS ts FROM aug),
            sc AS (SELECT doc_id,
                     len(list_filter(ts, t -> t IN ({en}))) AS s_en,
                     len(list_filter(ts, t -> t IN ({de}))) AS s_de,
                     len(list_filter(ts, t -> t IN ({fr}))) AS s_fr,
                     len(list_filter(ts, t -> t IN ({es}))) AS s_es
                   FROM ts),
            pred AS (SELECT doc_id,
                       CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0
                            THEN 'unknown'
                            WHEN s_en = greatest(s_en, s_de, s_fr, s_es)
                            THEN 'en'
                            WHEN s_de = greatest(s_en, s_de, s_fr, s_es)
                            THEN 'de'
                            WHEN s_fr = greatest(s_en, s_de, s_fr, s_es)
                            THEN 'fr'
                            ELSE 'es' END AS pred_lang
                     FROM sc)
            SELECT pred_lang, count(*) AS n_docs
            FROM pred GROUP BY pred_lang""",
        "q25_events_window": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                     AS window_start,
                   event_type, count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY date_trunc('hour', ts), event_type""",
        "q26_jw_pairs": """
            SELECT a.n_name AS name_a, b.n_name AS name_b,
                   floor(jaro_winkler_similarity(a.n_name, b.n_name)
                         * 1000) / 1000 AS jw
            FROM nation a CROSS JOIN nation b
            WHERE a.n_name < b.n_name""",
        "q27_graph_components": """
            WITH RECURSIVE b AS (SELECT DISTINCT user_id, event_type,
                              date_trunc('minute', ts) AS m FROM events),
            e0 AS (SELECT DISTINCT a.user_id AS u, c.user_id AS v
                   FROM b a JOIN b c
                     ON a.event_type = c.event_type AND a.m = c.m
                   WHERE a.user_id != c.user_id),
            users AS (SELECT DISTINCT user_id FROM events),
            r AS (
              SELECT user_id AS u, user_id AS v FROM users
              UNION
              SELECT r.u, e0.v FROM r JOIN e0 ON r.v = e0.u
            )
            SELECT u AS user_id, min(v) AS component_id
            FROM r GROUP BY u""",
        "q29_linked_terms": f"""
            WITH {_TOKS_CTE},
            dt AS (SELECT DISTINCT doc_id, tok FROM toks WHERE len(tok) >= 8),
            a AS (SELECT concat('A:', doc_id) AS linked_id, tok AS string
                  FROM dt WHERE doc_id % 2 = 0),
            b AS (SELECT concat('B:', doc_id) AS term_id, tok AS string
                  FROM dt WHERE doc_id % 2 = 1)
            SELECT DISTINCT term_id, linked_id
            FROM b JOIN a USING (string)
            WHERE term_id <> linked_id""",
        "q30_superterm_linked": """
            WITH anc AS (SELECT concat('N:', n_name) AS term_id,
                                concat('R:', n_regionkey) AS anc_id
                         FROM nation),
            uni AS (SELECT term_id FROM anc
                    UNION SELECT anc_id FROM anc
                    UNION SELECT concat('R:', r_regionkey) FROM region),
            sup AS (SELECT term_id, anc_id FROM anc
                    UNION SELECT term_id, term_id FROM uni),
            lk AS (SELECT concat('R:', r_regionkey) AS anc_id,
                          concat('X:', r_name) AS linked_id FROM region)
            SELECT DISTINCT term_id, linked_id
            FROM sup JOIN lk USING (anc_id)
            WHERE term_id <> linked_id""",
        "q31_implications": """
            WITH p AS (SELECT concat('P:', p_partkey) AS term_id,
                              lower(p_name) AS name FROM part),
            a AS (SELECT DISTINCT concat('A:', tok) AS implied_id, tok AS name
                  FROM (SELECT unnest(string_split(name, ' ')) AS tok FROM p)),
            -- b-in-a probe: a part name equal to a single token (none, but
            -- keep the semantics); then token-subset + substring match
            b AS (SELECT term_id, name FROM p
                  WHERE name NOT IN (SELECT name FROM a)),
            hit AS (SELECT b.term_id, a.implied_id
                    FROM b JOIN a ON b.name LIKE concat('%', a.name, '%')
                    WHERE a.name <> b.name
                      AND len(a.name) >= 3 AND len(b.name) >= 3
                      AND list_has_all(string_split(b.name, ' '),
                                       string_split(a.name, ' ')))
            SELECT DISTINCT term_id, implied_id FROM hit""",
        "q32_website_term_query": """
            WITH toks AS (SELECT doc_id, unnest(list_filter(
                   regexp_split_to_array(lower(text), '[^0-9a-z]+'),
                   t -> len(t) > 0)) AS tok FROM documents),
            lex(term, category) AS (VALUES ('scan','op'),('join','op'),
                 ('filter','op'),('sort','op'),('merge','op'),('window','op'),
                 ('hash','op'),('stream','op')),
            mapped AS (SELECT DISTINCT doc_id AS sample_accession,
                              term AS term_id
                       FROM toks JOIN lex ON tok = term),
            st AS (SELECT doc_id AS sample_accession,
                          CASE WHEN n_chars > 200 THEN 'tissue'
                               ELSE 'cell line' END AS sample_type,
                          0.9 AS confidence
                   FROM documents)
            SELECT sample_accession, term_id, sample_type, confidence
            FROM mapped JOIN st USING (sample_accession)
            WHERE term_id = 'scan' AND sample_type = 'cell line'""",
        "q33_subgraph_slice": """
            WITH RECURSIVE edges AS (
                SELECT concat('O:', o_orderkey) AS child_id,
                       concat('C:', o_custkey) AS parent_id FROM orders
                UNION ALL
                SELECT concat('C:', c_custkey), concat('N:', c_nationkey)
                FROM customer
                UNION ALL
                SELECT concat('N:', n_nationkey), concat('R:', n_regionkey)
                FROM nation),
            down(term_id) AS (
                SELECT 'R:0'
                UNION
                SELECT e.child_id FROM edges e JOIN down d
                  ON e.parent_id = d.term_id)
            SELECT DISTINCT term_id FROM down""",
        "q28_blocking_keys": f"""
            WITH {_TOKS_CTE},
            dt AS (SELECT DISTINCT doc_id, tok FROM toks)
            SELECT tok AS key, count(DISTINCT doc_id) AS n_docs
            FROM dt WHERE len(tok) >= 6 GROUP BY tok""",
        "q34_cellosaurus_synonyms": f"""
            WITH tok AS (
                SELECT concat('N:', n_nationkey) AS doc_id,
                       lower(n_name) AS token, 0 AS tstart,
                       CAST(len(n_name) AS INT) AS tend
                FROM nation),
            sets(set_id, member) AS (VALUES {_cvcl_syn_vals()}),
            exp AS (SELECT a.member AS token, b.member AS new_token
                    FROM sets a JOIN sets b USING (set_id)
                    WHERE a.member <> b.member)
            SELECT DISTINCT doc_id, token, tstart, tend FROM (
                SELECT doc_id, token, tstart, tend FROM tok
                UNION ALL
                SELECT t.doc_id, e.new_token, t.tstart, t.tend
                FROM tok t JOIN exp e ON t.token = e.token)""",
        "q35_atcc_filter": f"""
            SELECT doc_id, source AS key, lang AS value FROM documents
            WHERE source NOT IN ({_ATCC_KEYS_SQL})
              AND lang NOT IN ({_ATCC_VALS_SQL})""",
        # independent DuckDB re-implementation of the deterministic
        # multi-probe LSH IVF (same seeded hyperplanes): bucket ids,
        # Hamming-radius probe schedule, and within-bucket ranking must
        # all hash-match the Spark implementation
        "q36_ivf_probe": f"""
            SELECT e.vec_id,
                   round(list_cosine_similarity(
                     CAST(e.embedding AS DOUBLE[]),
                     CAST(q.embedding AS DOUBLE[])), 4) AS cosine
            FROM embeddings e,
                 (SELECT embedding FROM embeddings WHERE vec_id = 0) q
            WHERE e.vec_id != 0
              AND bit_count(CAST(xor(
                    {_lsh_list_id_sql('e.embedding')},
                    {_lsh_list_id_sql('q.embedding')}) AS BIGINT))
                  <= {_LSH_RADIUS}
            ORDER BY cosine DESC, e.vec_id LIMIT 5""",
        # independent DuckDB re-implementation of the deterministic
        # sha256-derived media decode stub + frame-sample schedule
        # (functions/multimodal.py): every metadata field re-derived
        # from sha256(media_ref) in SQL — full hash-match
        "q37_media_decode": """
            WITH m AS (
              SELECT doc_id,
                     concat('bucket/', doc_id, '.',
                            CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png'
                                 WHEN 1 THEN 'wav' ELSE 'mp4' END)
                       AS media_ref,
                     CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                          WHEN 1 THEN 'audio' ELSE 'video' END AS media_kind
              FROM documents WHERE doc_id % 10 < 3),
            d AS (SELECT doc_id, media_ref, media_kind,
                         sha256(media_ref) AS sha FROM m),
            x AS (SELECT doc_id, media_ref, media_kind, sha AS content_sha,
                    CAST(concat('0x', substring(sha, 1, 2)) AS INT) AS b0,
                    CAST(concat('0x', substring(sha, 3, 2)) AS INT) AS b1,
                    CAST(concat('0x', substring(sha, 5, 2)) AS INT) AS b2,
                    CAST(concat('0x', substring(sha, 7, 4)) AS INT) AS b34
                  FROM d)
            SELECT doc_id, media_ref, media_kind, content_sha,
                   CASE WHEN media_kind IN ('image', 'video')
                        THEN 64 + b0 END AS width,
                   CASE WHEN media_kind IN ('image', 'video')
                        THEN 64 + b1 END AS height,
                   CASE WHEN media_kind = 'video'
                        THEN 1 + b2 % 64 END AS n_frames,
                   CASE WHEN media_kind IN ('audio', 'video')
                        THEN 1000 + b34 END AS duration_ms,
                   CASE WHEN media_kind = 'video'
                        THEN CAST((b2 % 64) // 8 AS INT) + 1
                        ELSE 0 END AS n_sampled_frames,
                   b0 AS feat_byte0
            FROM x""",
        "q38_cosine_neardup": f"""
            WITH ex AS (
              SELECT vec_id, embedding, 0 AS band,
                     {_lsh_band_sql('embedding', 0)} AS bval
              FROM embeddings
              UNION ALL
              SELECT vec_id, embedding, 1,
                     {_lsh_band_sql('embedding', 1)}
              FROM embeddings),
            ok AS (SELECT band, bval FROM ex GROUP BY band, bval
                   HAVING count(*) <= {_NEARDUP_CAP}),
            scored AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     round(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 4) AS cosine
              FROM ex a
              JOIN ex b USING (band, bval)
              JOIN ok USING (band, bval)
              WHERE a.vec_id < b.vec_id)
            SELECT id_a, id_b, max(cosine) AS cosine
            FROM scored WHERE cosine >= {_NEARDUP_TAU}
            GROUP BY id_a, id_b""",
        "q39_asof_join": """
            WITH v AS (SELECT user_id, ts, event_id AS view_event_id
                       FROM events WHERE event_type = 'view'),
            c AS (SELECT event_id, user_id, ts
                  FROM events WHERE event_type = 'click')
            SELECT c.event_id, c.user_id, v.view_event_id,
                   CAST(date_diff('microseconds', v.ts, c.ts) AS BIGINT)
                     AS gap_us
            FROM c ASOF LEFT JOIN v
              ON c.user_id = v.user_id AND c.ts >= v.ts""",
        "q40_most_specific": """
            WITH cn AS (SELECT c_custkey, c_nationkey, n_regionkey
                        FROM customer JOIN nation
                          ON c_nationkey = n_nationkey),
            leaf AS (SELECT * FROM cn WHERE c_custkey % 3 = 0),
            mapped AS (
                SELECT DISTINCT c_custkey % 25 AS doc_id,
                       concat('C:', c_custkey) AS term_id FROM leaf
                UNION
                SELECT DISTINCT c_custkey % 25,
                       concat('N:', c_nationkey) FROM cn
                UNION
                SELECT DISTINCT c_custkey % 25,
                       concat('R:', n_regionkey) FROM cn),
            anc AS (
                SELECT concat('C:', c_custkey) AS term_id,
                       concat('N:', c_nationkey) AS anc_id FROM leaf
                UNION
                SELECT concat('C:', c_custkey),
                       concat('R:', n_regionkey) FROM leaf
                UNION
                SELECT concat('N:', n_nationkey),
                       concat('R:', n_regionkey) FROM nation),
            has_desc AS (
                SELECT DISTINCT m.doc_id, a.anc_id AS term_id
                FROM mapped m JOIN anc a ON m.term_id = a.term_id)
            SELECT m.doc_id, m.term_id FROM mapped m
            WHERE NOT EXISTS (SELECT 1 FROM has_desc h
                              WHERE h.doc_id = m.doc_id
                                AND h.term_id = m.term_id)""",
        # P1: same interval-grouped exact-over-fuzzy precedence; the
        # oracle builds match edges by brute-force cross join (the
        # engine's deletion-neighborhood join is recall-exact for
        # edit distance <= 1, so the candidate sets coincide).
        "q41_exact_over_fuzzy": """
            WITH tk AS (
                SELECT DISTINCT doc_id, tok,
                       CAST(strpos(t, tok) - 1 AS INT) AS "start",
                       CAST(strpos(t, tok) - 1 + len(tok) AS INT) AS "end"
                FROM (SELECT doc_id, lower(text) AS t,
                             unnest(list_filter(regexp_split_to_array(
                               lower(text), '[^0-9a-z]+'),
                               x -> len(x) > 0)) AS tok
                      FROM documents)),
            lex AS (SELECT * FROM (VALUES
                ('scan'), ('join'), ('filter'), ('sort'), ('merge'),
                ('window'), ('hash'), ('stream'), ('scann'), ('joinn'),
                ('filtr'), ('sorrt'), ('mereg')) l(term)),
            m AS (SELECT DISTINCT doc_id, "start", "end", term,
                         levenshtein(tok, term) AS edit_dist
                  FROM tk CROSS JOIN lex
                  WHERE levenshtein(tok, term) <= 1),
            he AS (SELECT doc_id, "start", "end",
                          max(CASE WHEN edit_dist = 0 THEN 1 ELSE 0 END)
                            AS h
                   FROM m GROUP BY 1, 2, 3)
            SELECT m.doc_id, m."start" AS start, m."end" AS "end",
                   m.term, m.edit_dist
            FROM m JOIN he USING (doc_id, "start", "end")
            WHERE m.edit_dist = 0 OR he.h = 0""",
        # P2: per (token interval, id-space) direct-over-inexact
        # suppression; NP: custom targets untouched.
        "q42_priority_filter": """
            WITH tk AS (
                SELECT DISTINCT doc_id, tok AS token,
                       CAST(strpos(t, tok) - 1 AS INT) AS "start",
                       CAST(strpos(t, tok) - 1 + len(tok) AS INT) AS "end"
                FROM (SELECT doc_id, lower(text) AS t,
                             unnest(list_filter(regexp_split_to_array(
                               lower(text), '[^0-9a-z]+'),
                               x -> len(x) > 0)) AS tok
                      FROM documents)),
            lex AS (SELECT * FROM (VALUES
                ('scan'), ('join'), ('filter'), ('sort'), ('merge'),
                ('window'), ('hash'), ('stream')) l(term)),
            hits AS (SELECT doc_id, token, "start", "end", term
                     FROM tk JOIN lex ON token = term),
            m AS (
                SELECT doc_id, token, "start", "end",
                       concat('A:', term) AS target_id,
                       'TERM_NAME' AS match_target
                FROM hits WHERE len(term) % 2 = 0
                UNION ALL
                SELECT doc_id, token, "start", "end",
                       concat('A:', term, ':syn'), 'INEXACT_SYNONYM'
                FROM hits
                UNION ALL
                SELECT doc_id, token, "start", "end",
                       concat('B:', term), 'INEXACT_SYNONYM'
                FROM hits
                UNION ALL
                SELECT doc_id, token, "start", "end",
                       concat('NP:', term), 'INEXACT_SYNONYM'
                FROM hits WHERE len(term) % 2 = 1),
            g AS (SELECT m.*,
                         NOT starts_with(target_id, 'NP:') AS is_term,
                         CASE WHEN starts_with(target_id, 'NP:')
                              THEN '_np'
                              ELSE split_part(target_id, ':', 1)
                         END AS sp,
                         match_target IN ('TERM_NAME', 'EXACT_SYNONYM',
                                          'ENRICHED_SYNONYM') AS direct
                  FROM m),
            hd AS (SELECT doc_id, token, "start", "end", sp,
                          max(CASE WHEN direct AND is_term THEN 1
                                   ELSE 0 END) AS h
                   FROM g GROUP BY 1, 2, 3, 4, 5)
            SELECT g.doc_id, g.token, g."start" AS start,
                   g."end" AS "end", g.target_id, g.match_target
            FROM g JOIN hd USING (doc_id, token, "start", "end", sp)
            WHERE (NOT g.is_term) OR g.direct OR hd.h = 0""",
        # I6: adult (> 18 year) age real-values imply the adult
        # developmental-stage pair.
        "q43_dev_stage_from_age": """
            SELECT DISTINCT user_id AS doc_id,
                   'RV:EFO:0000246' AS src_id, dst_id,
                   'Infer developmental stage' AS itype
            FROM events,
                 (VALUES ('EFO:0001272'), ('UBERON:0007023')) t(dst_id)
            WHERE event_id % 2 = 0 AND event_id % 3 <> 0
              AND (value % 50) > 18""",
        # A5: superterm closure — ancestors inherit the child's
        # consequent flag; min keeps an explicit False over any
        # inherited True.
        "q44_ancestor_closure": """
            WITH cn AS (SELECT c_custkey, c_nationkey, n_regionkey
                        FROM customer JOIN nation
                          ON c_nationkey = n_nationkey),
            leaf AS (SELECT * FROM cn WHERE c_custkey % 3 = 0),
            mapped AS (
                SELECT DISTINCT c_custkey % 25 AS doc_id,
                       concat('C:', c_custkey) AS term_id FROM leaf
                UNION
                SELECT DISTINCT c_custkey % 25,
                       concat('N:', c_nationkey) FROM cn),
            m2 AS (SELECT doc_id, term_id,
                          CAST(split_part(term_id, ':', 2) AS INT) % 2 = 0
                            AS consequent
                   FROM mapped),
            anc AS (
                SELECT concat('C:', c_custkey) AS term_id,
                       concat('N:', c_nationkey) AS anc_id FROM leaf
                UNION
                SELECT concat('C:', c_custkey),
                       concat('R:', n_regionkey) FROM leaf
                UNION
                SELECT concat('N:', n_nationkey),
                       concat('R:', n_regionkey) FROM nation),
            a_rows AS (SELECT m.doc_id, a.anc_id AS term_id, m.consequent
                       FROM m2 m JOIN anc a USING (term_id))
            SELECT doc_id, term_id, min(CAST(consequent AS INT))
                     AS consequent
            FROM (SELECT * FROM m2 UNION ALL SELECT * FROM a_rows)
            GROUP BY doc_id, term_id""",
        # T10: gated value tokens split into value + unit + expanded
        # unit-synonym tokens; ungated (odd-doc) and non-parsing tokens
        # pass through untouched.
        "q45_time_unit_parse": """
            WITH d AS (SELECT doc_id FROM documents),
            base AS (
                SELECT doc_id, 'age' AS token, 0 AS "start", 3 AS "end"
                FROM d
                UNION ALL
                SELECT doc_id,
                       concat(CAST(doc_id % 97 AS VARCHAR), 'h'), 10,
                       CAST(10 + len(concat(CAST(doc_id % 97 AS VARCHAR),
                                            'h')) AS INT)
                FROM d
                UNION ALL
                SELECT doc_id,
                       concat(CAST(doc_id % 13 AS VARCHAR), 'min'), 20,
                       CAST(20 + len(concat(CAST(doc_id % 13 AS VARCHAR),
                                            'min')) AS INT)
                FROM d
                UNION ALL
                SELECT doc_id, 'plain', 30, 35 FROM d),
            parsed AS (
                SELECT doc_id, token, "start", "end",
                       regexp_extract(token,
                         '^([0-9]*)\\s*(h|hr|mo|d|min)$', 1) AS v,
                       regexp_extract(token,
                         '^([0-9]*)\\s*(h|hr|mo|d|min)$', 2) AS u
                FROM base
                WHERE doc_id % 2 = 0 AND "start" >= 10 AND "end" <= 40
                  AND regexp_extract(token,
                        '^([0-9]*)\\s*(h|hr|mo|d|min)$', 2) <> ''),
            uexp AS (SELECT * FROM (VALUES
                ('hr', 'hour'), ('h', 'hour'), ('hrs', 'hour'),
                ('mo', 'month'), ('d', 'day'), ('min', 'minute'))
                e(u, expansion))
            SELECT DISTINCT doc_id, token, "start" AS start, "end" AS "end"
            FROM (
                SELECT doc_id, token, "start", "end" FROM base
                UNION ALL
                SELECT doc_id, v, "start",
                       CAST("start" + len(v) AS INT) FROM parsed
                UNION ALL
                SELECT doc_id, u, CAST("end" - len(u) AS INT), "end"
                FROM parsed
                UNION ALL
                SELECT p.doc_id, e.expansion,
                       CAST(p."end" - len(p.u) AS INT), p."end"
                FROM parsed p JOIN uexp e ON p.u = e.u)""",
        # R1: an INDEPENDENT derivation of the expected semantics (not a
        # mechanical join replay): property resolution incl. the 721→724
        # preference fold and the one-property guard, value tokens, and
        # the 0/1/many-unit cascade.
        "q46_real_value_extraction": """
            WITH d AS (SELECT doc_id FROM documents),
            prop AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 3 = 0 THEN 'EFO:0000724'
                            WHEN doc_id % 3 = 1 THEN 'PROP:BMI'
                       END AS property_id
                FROM d
                WHERE doc_id % 9 <> 0 AND doc_id % 3 <> 2),
            vals AS (
                SELECT doc_id, CAST(doc_id % 50 AS DOUBLE) AS value FROM d
                UNION
                SELECT doc_id, CAST(doc_id % 7 AS DOUBLE) FROM d
                WHERE doc_id % 4 = 0),
            units AS (
                SELECT doc_id,
                       (doc_id % 8 = 0) AS multi,
                       (doc_id % 2 = 0) AS has_unit
                FROM d)
            SELECT DISTINCT p.doc_id, p.property_id, v.value,
                   CASE WHEN u.multi THEN NULL
                        WHEN u.has_unit THEN 'UO:0000036'
                        WHEN p.property_id = 'EFO:0000724'
                          THEN 'UO:0000032'
                        ELSE 'missing' END AS unit_id,
                   'age' AS orig_key,
                   concat('v', CAST(p.doc_id AS VARCHAR)) AS orig_val
            FROM prop p JOIN vals v USING (doc_id)
                        JOIN units u USING (doc_id)""",
        # Full native-scorer ER: blocking → meta-blocking → composite
        # scoring (explicit Winkler boost — DuckDB's builtin
        # jaro_winkler_similarity boosts only when jaro > 0.7, ours is
        # unconditional) → threshold → exact-dup star edges →
        # recursive-CTE transitive closure.  Mirrors
        # er/resolution.py:resolve_entities_native exactly.
        # I2/I3/I4/I5: inference lookup-join row generators over the
        # deterministic per-doc term set; rv rows rendered as rv-typed
        # edges exactly like the Spark side.
        "q47_inference_edges": f"""
            WITH d AS (SELECT doc_id FROM documents),
            terms AS (
                SELECT doc_id, 'T:' || CAST(doc_id % 20 AS VARCHAR)
                         AS term_id
                FROM d
                UNION ALL
                SELECT doc_id, 'CVCL:000' || CAST(doc_id % 10 AS VARCHAR)
                FROM d WHERE doc_id % 2 = 0),
            impl(term_id, implied_id) AS (VALUES
                {", ".join(f"('{a}', '{b}')" for a, b in _IMPLIED_DISEASE)}),
            conseq(term_id, conseq_id) AS (VALUES
                {", ".join(f"('{a}', '{b}')" for a, b in _CONSEQUENT_TERMS)}),
            cvclt(cvcl_id, mapped_id) AS (VALUES
                {", ".join(f"('{a}', '{b}')" for a, b in _CVCL_TERMS)}),
            cvclrv(cvcl_id, property_id, value, unit_id) AS (VALUES
                {", ".join(f"('{a}', '{b}', {v}, '{u}')"
                           for a, b, v, u in _CVCL_REAL_VALS)})
            SELECT DISTINCT * FROM (
                SELECT t.doc_id, t.term_id AS src_id,
                       i.implied_id AS dst_id,
                       'Cell line to implied disease' AS itype
                FROM terms t JOIN impl i USING (term_id)
                UNION ALL
                SELECT t.doc_id, t.term_id, c.conseq_id,
                       'Custom consequent term'
                FROM terms t JOIN conseq c USING (term_id)
                UNION ALL
                SELECT t.doc_id, t.term_id, v.dst_id,
                       'Cell culture from cell line'
                FROM terms t CROSS JOIN (VALUES ('CL:0000010'),
                                                ('EFO_BTO:0000214'))
                               v(dst_id)
                WHERE string_split(t.term_id, ':')[1] = 'CVCL'
                UNION ALL
                SELECT t.doc_id, t.term_id, m.mapped_id,
                       'Inferred from cell line data'
                FROM terms t JOIN cvclt m ON t.term_id = m.cvcl_id
                UNION ALL
                SELECT t.doc_id, t.term_id,
                       r.property_id || '=' || printf('%.1f', r.value)
                         || '|' || r.unit_id,
                       'rv'
                FROM terms t JOIN cvclrv r ON t.term_id = r.cvcl_id)""",
        # J3 two-char whitelist + J4 noun-phrase custom targets over the
        # corpus token intervals.
        "q48_custom_matches": f"""
            WITH tk AS (
                SELECT DISTINCT doc_id, tok AS token,
                       CAST(strpos(t, tok) - 1 AS INT) AS "start",
                       CAST(strpos(t, tok) - 1 + len(tok) AS INT) AS "end"
                FROM (SELECT doc_id, lower(text) AS t,
                             unnest(list_filter(regexp_split_to_array(
                               lower(text), '[^0-9a-z]+'),
                               x -> len(x) > 0)) AS tok
                      FROM documents)),
            twoch(token, term_id) AS (VALUES
                {", ".join(f"('{a}', '{b}')" for a, b in _TWO_CHAR)}),
            np(phrase) AS (VALUES
                {", ".join(f"('{p}')" for p in _NOUN_PHRASES)})
            SELECT tk.doc_id, tk.token, tk."start", tk."end",
                   w.term_id AS target_id,
                   'CUSTOM_TWO_CHAR_MATCH' AS match_target
            FROM tk JOIN twoch w USING (token)
            UNION ALL
            SELECT tk.doc_id, tk.token, tk."start", tk."end",
                   'NP:' || np.phrase,
                   'CUSTOM_NOUN_PHRASE'
            FROM tk JOIN np ON tk.token = np.phrase""",
        # P4: cell-line matches under a non-cell-line key are deleted
        # unless protected by evidence inside a cell-line-typed kv.
        "q50_block_cell_line": """
            WITH d AS (SELECT doc_id FROM documents),
            kv AS (
                SELECT doc_id, 0 AS key_start, 8 AS key_end,
                       10 AS val_start, 30 AS val_end FROM d
                UNION ALL
                SELECT doc_id, 40, 45, 50, 70 FROM d),
            m AS (
                SELECT doc_id, 0 AS "start", 8 AS "end",
                       'EFO:0000322' AS target_id FROM d WHERE doc_id % 3 = 0
                UNION ALL
                SELECT doc_id, 10, 18, 'CVCL:0077' FROM d WHERE doc_id % 2 = 0
                UNION ALL
                SELECT doc_id, 50, 58, 'CVCL:0088' FROM d WHERE doc_id % 5 = 0
                UNION ALL
                SELECT doc_id, 12, 20, 'UBERON:0002' FROM d),
            clkv AS (
                SELECT DISTINCT kv.doc_id, kv.key_start, kv.key_end,
                       kv.val_start, kv.val_end
                FROM kv JOIN m ON kv.doc_id = m.doc_id
                WHERE m."start" >= kv.key_start AND m."end" <= kv.key_end
                  AND m.target_id IN ('EFO:0000322', 'EFO:0000324')),
            clm AS (
                SELECT * FROM m
                WHERE target_id IN ('CVCL:0077', 'CVCL:0088')),
            protected AS (
                SELECT DISTINCT c.doc_id, c.target_id
                FROM clm c JOIN clkv k ON c.doc_id = k.doc_id
                WHERE (c."start" >= k.key_start AND c."end" <= k.key_end)
                   OR (c."start" >= k.val_start AND c."end" <= k.val_end)),
            nonclkv AS (
                SELECT kv.doc_id, kv.val_start, kv.val_end
                FROM kv
                WHERE NOT EXISTS (
                    SELECT 1 FROM clkv
                    WHERE clkv.doc_id = kv.doc_id
                      AND clkv.key_start = kv.key_start)),
            triggered AS (
                SELECT DISTINCT c.doc_id, c.target_id
                FROM clm c JOIN nonclkv k ON c.doc_id = k.doc_id
                WHERE c."start" >= k.val_start AND c."end" <= k.val_end),
            deleted AS (
                SELECT t.doc_id, t.target_id FROM triggered t
                WHERE NOT EXISTS (
                    SELECT 1 FROM protected p
                    WHERE p.doc_id = t.doc_id
                      AND p.target_id = t.target_id))
            SELECT m.doc_id, m."start", m."end", m.target_id
            FROM m
            WHERE NOT EXISTS (
                SELECT 1 FROM deleted x
                WHERE x.doc_id = m.doc_id
                  AND x.target_id = m.target_id)""",
        # I7: combo fires iff all required terms present AND tokens from
        # >= n_required_artifacts distinct artifact sets; one edge per
        # required term.
        "q51_artifact_combos": f"""
            WITH d AS (SELECT doc_id FROM documents),
            terms AS (
                SELECT DISTINCT doc_id, term_id FROM (
                    SELECT doc_id,
                           'T:' || CAST(doc_id % 4 AS VARCHAR) AS term_id
                    FROM d
                    UNION ALL
                    SELECT doc_id, 'T:' || CAST(doc_id % 5 AS VARCHAR)
                    FROM d)),
            req(combo_id, required_term, n_required_artifacts,
                consequent_term) AS (VALUES
                {", ".join(f"('{c}', '{t}', {n}, '{q}')"
                           for c, t, n, q in _COMBO_REQUIRED)}),
            art(combo_id, artifact_set_id, artifact) AS (VALUES
                {", ".join(f"('{c}', '{s}', '{a}')"
                           for c, s, a in _COMBO_ARTIFACTS)}),
            tok AS (
                SELECT doc_id,
                       unnest(list_filter(regexp_split_to_array(
                         lower(text), '[^0-9a-z]+'), x -> len(x) > 0))
                         AS token
                FROM documents),
            have AS (
                SELECT t.doc_id, r.combo_id, r.n_required_artifacts,
                       r.consequent_term,
                       count(DISTINCT r.required_term) AS n_have
                FROM terms t JOIN req r ON t.term_id = r.required_term
                GROUP BY 1, 2, 3, 4),
            nreq AS (
                SELECT combo_id,
                       count(DISTINCT required_term) AS n_req
                FROM req GROUP BY 1),
            terms_ok AS (
                SELECT h.doc_id, h.combo_id, h.n_required_artifacts,
                       h.consequent_term
                FROM have h JOIN nreq USING (combo_id)
                WHERE h.n_have = nreq.n_req),
            art_hits AS (
                SELECT tok.doc_id, art.combo_id,
                       count(DISTINCT art.artifact_set_id) AS n_sets
                FROM tok JOIN art ON tok.token = art.artifact
                GROUP BY 1, 2),
            fired AS (
                SELECT o.doc_id, o.combo_id, o.consequent_term
                FROM terms_ok o JOIN art_hits a
                  ON o.doc_id = a.doc_id AND o.combo_id = a.combo_id
                WHERE a.n_sets >= o.n_required_artifacts)
            SELECT DISTINCT f.doc_id, r.required_term AS src_id,
                   f.consequent_term AS dst_id,
                   'Found co-occuring artifacts' AS itype
            FROM fired f
            JOIN req r USING (combo_id)
            JOIN terms t ON t.doc_id = f.doc_id
                        AND t.term_id = r.required_term""",
        # A2/A3/A4 + seed/closure reachability: recursive closure over
        # non-RV inference edges from the seed set; consequent = no
        # match row and no non-consequent in-edge; mappable prefixes,
        # blacklist, rv-property exclusion.
        "q52_consolidate_flags": """
            WITH RECURSIVE d AS (SELECT doc_id FROM documents),
            m AS (
                SELECT doc_id,
                       'T:' || CAST(doc_id % 8 AS VARCHAR) AS target_id
                FROM d
                UNION ALL
                SELECT doc_id, 'CVCL:000' || CAST(doc_id % 10 AS VARCHAR)
                FROM d WHERE doc_id % 2 = 0
                UNION ALL
                SELECT doc_id, 'NP:foo' FROM d),
            e AS (
                SELECT doc_id,
                       'T:' || CAST(doc_id % 8 AS VARCHAR) AS src_id,
                       'CONS:' || CAST(doc_id % 3 AS VARCHAR) AS dst_id,
                       'Custom consequent term' AS itype
                FROM d WHERE doc_id % 2 = 0
                UNION ALL
                SELECT doc_id, 'CONS:' || CAST(doc_id % 3 AS VARCHAR),
                       'DEEP:1', 'Linked term of superterm'
                FROM d WHERE doc_id % 3 = 0
                UNION ALL
                SELECT doc_id, 'T:' || CAST(doc_id % 8 AS VARCHAR),
                       'EXP:2', 'Derived'
                FROM d WHERE doc_id % 5 = 0
                UNION ALL
                SELECT doc_id, 'RV:EFO:0000246', 'RVT:9',
                       'Infer developmental stage'
                FROM d WHERE doc_id % 7 = 0
                UNION ALL
                SELECT doc_id, 'GHOST:1', 'NOWHERE:5',
                       'Custom consequent term'
                FROM d WHERE doc_id % 9 = 0),
            seeds AS (
                SELECT DISTINCT doc_id, target_id AS term_id FROM m
                WHERE target_id NOT LIKE 'NP:%'
                UNION
                SELECT DISTINCT doc_id, dst_id FROM e
                WHERE src_id LIKE 'RV:%'),
            te AS (
                SELECT DISTINCT doc_id, src_id, dst_id FROM e
                WHERE src_id NOT LIKE 'RV:%'),
            reach AS (
                SELECT doc_id, term_id FROM seeds
                UNION
                SELECT te.doc_id, te.dst_id
                FROM reach JOIN te
                  ON reach.doc_id = te.doc_id
                 AND reach.term_id = te.src_id),
            explicit AS (
                SELECT DISTINCT doc_id, target_id AS term_id FROM m
                WHERE target_id NOT LIKE 'NP:%'
                UNION
                SELECT DISTINCT doc_id, dst_id FROM e
                WHERE itype NOT IN ('Custom consequent term',
                                    'Linked term of superterm',
                                    'Cell culture from cell line',
                                    'Infer developmental stage',
                                    'Inferred from cell line data')),
            rvprops AS (
                SELECT doc_id, 'T:0' AS term_id FROM d
                WHERE doc_id % 16 = 0)
            SELECT r.doc_id, r.term_id,
                   CASE WHEN x.term_id IS NULL THEN 1 ELSE 0 END
                     AS consequent
            FROM reach r
            LEFT JOIN explicit x
              ON r.doc_id = x.doc_id AND r.term_id = x.term_id
            WHERE string_split(r.term_id, ':')[1] IN
                    ('T', 'CONS', 'DEEP', 'CVCL', 'RVT', 'EXP', 'NOWHERE')
              AND r.term_id <> 'T:7'
              AND NOT EXISTS (
                  SELECT 1 FROM rvprops p
                  WHERE p.doc_id = r.doc_id
                    AND p.term_id = r.term_id)""",
        # A1: min-depth kv-anchored provenance path per (doc, term) —
        # base layer anchored inside kv key/value spans, recursive
        # expansion through inference edges (RV: sources hand their
        # property term's provenance onward), reference tie order.
        "q53_provenance": """
            WITH RECURSIVE d AS (SELECT doc_id FROM documents),
            kv AS (
                SELECT doc_id, 'age' AS key,
                       'v' || CAST(doc_id AS VARCHAR) AS value,
                       0 AS key_start, 3 AS key_end,
                       10 AS val_start, 40 AS val_end
                FROM d
                UNION ALL
                SELECT doc_id, 'tissue', 'w' || CAST(doc_id AS VARCHAR),
                       50, 56, 60, 90
                FROM d),
            m AS (
                SELECT doc_id, 'age' AS token, 0 AS "start", 3 AS "end",
                       'T:KEY' AS target_id, 'TERM_NAME' AS match_target,
                       0 AS edit_dist
                FROM d
                UNION ALL
                SELECT doc_id, 'x', 12, 13, 'T:VAL', 'EXACT_SYNONYM', 1
                FROM d WHERE doc_id % 2 = 0
                UNION ALL
                SELECT doc_id, 'tissue', 50, 56, 'T:KEY', 'TERM_NAME', 0
                FROM d WHERE doc_id % 3 = 0),
            e AS (
                SELECT doc_id, 'T:VAL' AS src_id, 'I:1' AS dst_id,
                       'Custom consequent term' AS itype
                FROM d WHERE doc_id % 2 = 0
                UNION ALL
                SELECT doc_id, 'T:KEY', 'I:1', 'Linked term of superterm'
                FROM d WHERE doc_id % 4 = 0
                UNION ALL
                SELECT doc_id, 'RV:T:KEY', 'R:2',
                       'Infer developmental stage'
                FROM d WHERE doc_id % 5 = 0
                UNION ALL
                SELECT doc_id, 'I:1', 'DEEP:3', 'Custom consequent term'
                FROM d WHERE doc_id % 3 = 0),
            ae AS (
                SELECT doc_id,
                       CASE WHEN src_id LIKE 'RV:%'
                            THEN substr(src_id, 4) ELSE src_id END
                         AS term_id,
                       dst_id, itype
                FROM e),
            base AS (
                SELECT m.doc_id, m.target_id AS term_id,
                       kv.key AS orig_key, kv.value AS orig_val,
                       0 AS depth, kv.key_start, m."start",
                       'kv[' || side || ']:' || kv.key || '=' || kv.value
                         || ' > tok:' || m.token
                         || ' > match:' || m.match_target || ' edit='
                         || CAST(m.edit_dist AS VARCHAR)
                         || ' > term:' || m.target_id AS path
                FROM m JOIN kv ON m.doc_id = kv.doc_id
                CROSS JOIN (VALUES ('key'), ('val')) s(side)
                WHERE (side = 'key' AND m."start" >= kv.key_start
                       AND m."end" <= kv.key_end)
                   OR (side = 'val' AND m."start" >= kv.val_start
                       AND m."end" <= kv.val_end)),
            prov AS (
                SELECT * FROM base
                UNION ALL
                SELECT p.doc_id, ae.dst_id, p.orig_key, p.orig_val,
                       p.depth + 1, p.key_start, p."start",
                       p.path || ' > inf:' || ae.itype
                              || ' > term:' || ae.dst_id
                FROM prov p JOIN ae
                  ON p.doc_id = ae.doc_id AND p.term_id = ae.term_id
                WHERE p.depth < 6)
            SELECT doc_id, term_id, orig_key, orig_val, path
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY doc_id, term_id
                      ORDER BY depth, key_start, "start",
                               orig_key, orig_val, path) AS rn
                  FROM prov)
            WHERE rn = 1""",
        # T2-T8 expansion closure: the oracle independently derives
        # which parents spawn which children at which intervals under
        # the one-pass snapshot-ordered stage semantics (lowercase
        # before delimit => split parts of the initcap variant are
        # never re-lowercased; variant/synonym/acronym maps fire on
        # exact standalone tokens only).
        "q54_expansion_edges": """
            WITH d AS (
                SELECT doc_id,
                       CAST(doc_id % 3 AS VARCHAR) AS k,
                       CAST(doc_id % 7 AS VARCHAR) AS a,
                       CAST(doc_id % 5 AS VARCHAR) AS b
                FROM documents)
            SELECT doc_id, 'Gene' || k AS ptoken, 0 AS pstart,
                   5 AS pend, 'gene' || k AS token, 0 AS "start",
                   5 AS "end", 'Lowercase' AS kind
            FROM d
            UNION ALL SELECT doc_id, 'gene' || k, 0, 5,
                   'genes' || k, 0, 5, 'Inflectional variant' FROM d
            UNION ALL SELECT doc_id, 'Ab' || k || '_beta' || b, 10, 19,
                   'ab' || k || '_beta' || b, 10, 19, 'Lowercase' FROM d
            UNION ALL SELECT doc_id, 'Ab' || k || '_beta' || b, 10, 19,
                   'Ab' || k, 10, 13, 'Delimiter' FROM d
            UNION ALL SELECT doc_id, 'Ab' || k || '_beta' || b, 10, 19,
                   'beta' || b, 14, 19, 'Delimiter' FROM d
            UNION ALL SELECT doc_id, 'ab' || k || '_beta' || b, 10, 19,
                   'ab' || k, 10, 13, 'Delimiter' FROM d
            UNION ALL SELECT doc_id, 'ab' || k || '_beta' || b, 10, 19,
                   'beta' || b, 14, 19, 'Delimiter' FROM d
            UNION ALL SELECT doc_id, 'ab' || k, 10, 13,
                   'aybee' || k, 10, 13, 'Spelling variant' FROM d
            UNION ALL SELECT doc_id, 'alpha' || a || '-beta' || b, 30, 42,
                   'alpha' || a, 30, 36, 'Delimiter' FROM d
            UNION ALL SELECT doc_id, 'alpha' || a || '-beta' || b, 30, 42,
                   'beta' || b, 37, 42, 'Delimiter' FROM d
            UNION ALL SELECT doc_id, 'alpha' || a || '+cd4', 50, 60,
                   'alpha' || a, 50, 56, 'Delimiter' FROM d
            UNION ALL SELECT doc_id, 'alpha' || a || '+cd4', 50, 60,
                   'cd4', 57, 60, 'Delimiter' FROM d
            UNION ALL SELECT doc_id, 'cd4', 57, 60,
                   'tcell', 57, 60, 'Synonym' FROM d
            UNION ALL SELECT doc_id, 'cd4', 57, 60,
                   'cluster of differentiation 4', 57, 60,
                   'Acronym to expansion' FROM d
            UNION ALL SELECT doc_id, 'alpha' || a || '/beta' || b, 70, 82,
                   'alpha' || a, 70, 76, 'Delimiter' FROM d
            UNION ALL SELECT doc_id, 'alpha' || a || '/beta' || b, 70, 82,
                   'beta' || b, 77, 82, 'Delimiter' FROM d""",
        # C1/C2: per-field uni+bigram counts — delimiters to spaces,
        # lowercase, length>1 tokens, adjacent bigrams within a field,
        # stop-grams dropped, degenerate docs keep one ('',1) row.
        "q55_classifier_grams": f"""
            WITH fields AS (
                SELECT doc_id, 'a' AS t FROM documents WHERE doc_id % 13 = 0
                UNION ALL
                SELECT doc_id, 'of' FROM documents WHERE doc_id % 13 = 0
                UNION ALL
                SELECT doc_id, 'cell_type' FROM documents
                WHERE doc_id % 13 <> 0
                UNION ALL
                SELECT doc_id, text FROM documents WHERE doc_id % 13 <> 0
                UNION ALL
                SELECT doc_id, 'age-of.donor' FROM documents
                WHERE doc_id % 13 <> 0
                UNION ALL
                SELECT doc_id, source FROM documents
                WHERE doc_id % 13 <> 0),
            tk AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(
                         lower(regexp_replace(t, '[_/\\-]', ' ', 'g')),
                         '[^0-9a-z+.]+'), x -> len(x) > 1) AS toks
                FROM fields),
            grams AS (
                SELECT doc_id, unnest(toks) AS gram FROM tk
                UNION ALL
                SELECT doc_id,
                       unnest(list_transform(toks[2:],
                              (x, i) -> toks[i] || ' ' || x))
                FROM tk),
            kept AS (
                SELECT doc_id, gram FROM grams
                WHERE gram NOT IN
                    ({", ".join(f"'{s}'" for s in
                                ["the", "of", "a", "an", "and", "or", "in",
                                 "on", "at", "to", "for", "with", "is",
                                 "was", "were", "be", "been", "from", "by",
                                 "as", "this", "that", "not"])}))
            SELECT doc_id, gram, count(*) AS n FROM kept GROUP BY 1, 2
            UNION ALL
            SELECT DISTINCT doc_id, '', 1 FROM fields
            WHERE doc_id NOT IN (SELECT doc_id FROM kept)""",
        # C5/C6: rule flags derived independently from the fixture
        # arithmetic; per-label zero masks, renormalize, first-max
        # argmax (all-zero vectors skip renormalization).
        "q56_rule_overrides": """
            WITH f AS (
                SELECT doc_id,
                       doc_id % 11 = 0 AS xeno,
                       doc_id % 4 = 0 AS has_stem,
                       doc_id % 6 = 0 AS has_celltype,
                       doc_id % 5 = 0 AS has_primary,
                       doc_id % 2 = 0 AS is_passaged,
                       doc_id % 2 = 0 AND doc_id % 3 = 2 AS passaged_pos,
                       doc_id % 3 = 0 AS found_clt,
                       doc_id % 9 = 0 AS embry,
                       NOT (doc_id % 11 = 0) AND NOT (doc_id % 3 = 0)
                         AS noclt
                FROM documents),
            lab(i, label) AS (VALUES
                (0, 'cell_line'), (1, 'in_vitro_differentiated_cells'),
                (2, 'induced_pluripotent_stem_cells'),
                (3, 'primary_cells'), (4, 'stem_cells'), (5, 'tissue')),
            m AS (
                SELECT f.doc_id, l.i, l.label,
                       CASE WHEN
                         CASE l.i
                           WHEN 0 THEN xeno
                             OR (NOT xeno AND found_clt AND embry)
                             OR (noclt AND has_stem)
                             OR (noclt AND has_primary
                                 AND NOT is_passaged)
                           WHEN 1 THEN xeno
                             OR (NOT xeno AND found_clt)
                             OR (noclt AND has_primary
                                 AND NOT is_passaged)
                           WHEN 2 THEN xeno
                             OR (NOT xeno AND found_clt)
                             OR (noclt AND has_primary
                                 AND NOT is_passaged)
                           WHEN 3 THEN xeno
                             OR (NOT xeno AND passaged_pos)
                             OR (NOT xeno AND found_clt)
                             OR (noclt AND has_stem)
                           WHEN 4 THEN xeno
                             OR (NOT xeno AND found_clt)
                           ELSE (NOT xeno AND is_passaged)
                             OR (NOT xeno AND found_clt)
                             OR (noclt AND has_stem)
                             OR (noclt AND NOT has_stem
                                 AND has_celltype)
                             OR (noclt AND has_primary
                                 AND NOT is_passaged)
                         END
                       THEN 0.0
                       ELSE CAST((f.doc_id * 7 + l.i * 13) % 19 + 1
                                 AS DOUBLE) END AS v
                FROM f CROSS JOIN lab l),
            t AS (SELECT doc_id, sum(v) AS total FROM m GROUP BY 1),
            n AS (
                SELECT m.doc_id, m.i, m.label,
                       CASE WHEN t.total > 0 THEN m.v / t.total
                            ELSE m.v END AS nv
                FROM m JOIN t USING (doc_id))
            SELECT doc_id, label AS sample_type,
                   round(nv, 4) AS confidence
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY doc_id
                      ORDER BY nv DESC, i) AS rn
                  FROM n)
            WHERE rn = 1""",
        # F1 key/value blocklist anti-joins + F3 per-kv key/value tokens
        # carrying the running char intervals.
        "q49_filter_init_tokens": f"""
            WITH kv AS (
                SELECT doc_id,
                       list_extract(['tissue', 'lab', 'age', 'id',
                                     'strain'],
                                    CAST(doc_id % 5 + 1 AS INT)) AS key,
                       CASE WHEN doc_id % 7 = 0 THEN 'missing'
                            WHEN doc_id % 11 = 0 THEN 'n/a'
                            ELSE source END AS value
                FROM documents),
            kept AS (
                SELECT * FROM kv
                WHERE key NOT IN
                        ({", ".join(f"'{k}'" for k in _FILTER_KEYS)})
                  AND value NOT IN
                        ({", ".join(f"'{v}'" for v in _FILTER_VALUES)}))
            SELECT doc_id, key AS token, 0 AS "start",
                   CAST(len(key) AS INT) AS "end"
            FROM kept
            UNION ALL
            SELECT doc_id, value, CAST(len(key) + 2 AS INT),
                   CAST(len(key) + 2 + len(value) AS INT)
            FROM kept""",
        "q93_er_native": f"""
            WITH RECURSIVE tk AS (
              SELECT concat('D', lpad(CAST(doc_id AS VARCHAR), 8, '0'))
                       AS doc_id,
                     unnest(list_filter(regexp_split_to_array(
                       lower(text), '[^0-9a-z+'']+'), t -> len(t) > 0))
                       AS tok
              FROM documents
              UNION ALL
              SELECT concat('D', lpad(CAST(doc_id AS VARCHAR), 8, '0')),
                     unnest(list_filter(regexp_split_to_array(
                       lower(source), '[^0-9a-z+'']+'), t -> len(t) > 0))
              FROM documents),
            prof AS (
              SELECT doc_id,
                     array_to_string(list_sort(list(DISTINCT tok)), ' ')
                       AS profile
              FROM tk GROUP BY doc_id),
            reps AS (
              SELECT profile, min(doc_id) AS doc_id,
                     string_split(profile, ' ') AS toks
              FROM prof GROUP BY profile),
            keys AS (
              SELECT doc_id, unnest(toks) AS key FROM reps),
            kept AS (
              SELECT doc_id, key FROM keys
              WHERE len(key) >= 3 AND key NOT IN ({_ER_STOP_SQL})
                AND key NOT IN (SELECT key FROM keys
                                GROUP BY key
                                HAVING count(DISTINCT doc_id) > 200)),
            kdf AS (
              SELECT key, count(*) AS df FROM kept GROUP BY key),
            cand AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM kept a JOIN kept b ON a.key = b.key
                   JOIN kdf d ON a.key = d.key
              WHERE a.doc_id < b.doc_id
              GROUP BY 1, 2 HAVING count(*) >= 2 OR min(d.df) <= 16),
            {_er_score_chain_sql('', 'cand', 'reps')},
            star AS (
              SELECT r.doc_id AS doc_a, p.doc_id AS doc_b
              FROM prof p JOIN reps r ON p.profile = r.profile
              WHERE p.doc_id <> r.doc_id),
            e0 AS (
              SELECT doc_a AS u, doc_b AS v FROM edges
              UNION SELECT doc_b, doc_a FROM edges
              UNION SELECT doc_a, doc_b FROM star
              UNION SELECT doc_b, doc_a FROM star),
            docs AS (SELECT DISTINCT doc_id FROM prof),
            r AS (
              SELECT doc_id AS u, doc_id AS v FROM docs
              UNION
              SELECT r.u, e0.v FROM r JOIN e0 ON r.v = e0.u
            )
            SELECT u AS doc_id, min(v) AS cluster_id
            FROM r GROUP BY u""",
        # Incremental landing: independently re-derives the INCREMENTAL
        # semantics of er/incremental.py (NOT a batch-rerun shortcut):
        #  - base phase = the q93 pipeline restricted to part<3 docs,
        #    hot-key cap judged on BASE rep counts only
        #    (resolution.py:567);
        #  - delta phase = pairs with >=1 new endpoint (new x new self-
        #    join  UNION ALL  new x base equi-join,
        #    incremental.py:60-79), cap judged on COMBINED counts over
        #    keys the delta touches (incremental.py:199-221), exact-
        #    profile attach edges (incremental.py:188-193), same scorer
        #    chain;
        #  - one transitive closure over base edges + delta edges +
        #    both phases' dup star edges + attach edges == the star-
        #    contracted delta CC + merge-log relabel + min-doc_id
        #    canonicalization the Spark side performs.
        "q94_er_incremental_native": f"""
            WITH RECURSIVE tk AS (
              SELECT concat('D', lpad(CAST(doc_id AS VARCHAR), 8, '0'))
                       AS doc_id,
                     CAST(doc_id % 4 AS INT) AS part,
                     unnest(list_filter(regexp_split_to_array(
                       lower(text), '[^0-9a-z+'']+'), t -> len(t) > 0))
                       AS tok
              FROM documents
              UNION ALL
              SELECT concat('D', lpad(CAST(doc_id AS VARCHAR), 8, '0')),
                     CAST(doc_id % 4 AS INT),
                     unnest(list_filter(regexp_split_to_array(
                       lower(source), '[^0-9a-z+'']+'), t -> len(t) > 0))
              FROM documents),
            prof AS (
              SELECT doc_id, min(part) AS part,
                     array_to_string(list_sort(list(DISTINCT tok)), ' ')
                       AS profile
              FROM tk GROUP BY doc_id),
            bprof AS (SELECT * FROM prof WHERE part < 3),
            breps AS (
              SELECT profile, min(doc_id) AS doc_id,
                     string_split(profile, ' ') AS toks
              FROM bprof GROUP BY profile),
            bkeys AS (
              SELECT doc_id, unnest(toks) AS key FROM breps),
            bkept AS (
              SELECT doc_id, key FROM bkeys
              WHERE len(key) >= 3 AND key NOT IN ({_ER_STOP_SQL})
                AND key NOT IN (SELECT key FROM bkeys
                                GROUP BY key
                                HAVING count(DISTINCT doc_id) > 200)),
            bkdf AS (
              SELECT key, count(*) AS df FROM bkept GROUP BY key),
            bcand AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bkept a JOIN bkept b ON a.key = b.key
                   JOIN bkdf d ON a.key = d.key
              WHERE a.doc_id < b.doc_id
              GROUP BY 1, 2 HAVING count(*) >= 2 OR min(d.df) <= 16),
            {_er_score_chain_sql('b', 'bcand', 'breps')},
            bstar AS (
              SELECT r.doc_id AS doc_a, p.doc_id AS doc_b
              FROM bprof p JOIN breps r ON p.profile = r.profile
              WHERE p.doc_id <> r.doc_id),
            nprof AS (SELECT * FROM prof WHERE part = 3),
            nreps AS (
              SELECT profile, min(doc_id) AS doc_id,
                     string_split(profile, ' ') AS toks
              FROM nprof GROUP BY profile),
            nstar AS (
              SELECT r.doc_id AS doc_a, p.doc_id AS doc_b
              FROM nprof p JOIN nreps r ON p.profile = r.profile
              WHERE p.doc_id <> r.doc_id),
            attach AS (
              SELECT n.doc_id AS doc_a, o.doc_id AS doc_b
              FROM nreps n JOIN breps o ON n.profile = o.profile),
            useen AS (
              SELECT * FROM nreps
              WHERE doc_id NOT IN (SELECT doc_a FROM attach)),
            nkeys AS (
              SELECT doc_id, key FROM (
                SELECT doc_id, unnest(toks) AS key FROM useen)
              WHERE len(key) >= 3 AND key NOT IN ({_ER_STOP_SQL})),
            bkeysu AS (
              SELECT doc_id, key FROM (
                SELECT doc_id, unnest(toks) AS key FROM breps)
              WHERE len(key) >= 3 AND key NOT IN ({_ER_STOP_SQL})),
            sizes AS (
              SELECT key, count(DISTINCT doc_id) AS n_docs FROM (
                SELECT key, doc_id FROM nkeys
                UNION ALL
                SELECT key, doc_id FROM bkeysu
                WHERE key IN (SELECT DISTINCT key FROM nkeys))
              GROUP BY key),
            nkept AS (
              SELECT doc_id, key FROM nkeys
              WHERE key NOT IN (SELECT key FROM sizes
                                WHERE n_docs > 200)),
            dcand AS (
              SELECT doc_a, doc_b FROM (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       s.n_docs AS df
                FROM nkept a JOIN nkept b ON a.key = b.key
                     JOIN sizes s ON a.key = s.key
                WHERE a.doc_id < b.doc_id
                UNION ALL
                SELECT least(n.doc_id, o.doc_id) AS doc_a,
                       greatest(n.doc_id, o.doc_id) AS doc_b,
                       s.n_docs AS df
                FROM nkept n JOIN bkeysu o ON n.key = o.key
                     JOIN sizes s ON n.key = s.key)
              GROUP BY doc_a, doc_b
              HAVING count(*) >= 2 OR min(df) <= 16),
            rp AS (
              SELECT doc_id, profile, toks FROM breps
              UNION ALL
              SELECT doc_id, profile, toks FROM useen),
            {_er_score_chain_sql('d', 'dcand', 'rp')},
            e0 AS (
              SELECT doc_a AS u, doc_b AS v FROM bedges
              UNION SELECT doc_b, doc_a FROM bedges
              UNION SELECT doc_a, doc_b FROM dedges
              UNION SELECT doc_b, doc_a FROM dedges
              UNION SELECT doc_a, doc_b FROM bstar
              UNION SELECT doc_b, doc_a FROM bstar
              UNION SELECT doc_a, doc_b FROM nstar
              UNION SELECT doc_b, doc_a FROM nstar
              UNION SELECT doc_a, doc_b FROM attach
              UNION SELECT doc_b, doc_a FROM attach),
            docs AS (SELECT DISTINCT doc_id FROM prof),
            r AS (
              SELECT doc_id AS u, doc_id AS v FROM docs
              UNION
              SELECT r.u, e0.v FROM r JOIN e0 ON r.v = e0.u
            )
            SELECT u AS doc_id, min(v) AS cluster_id
            FROM r GROUP BY u""",
    }
