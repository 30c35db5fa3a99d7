"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline and an IVF-style
partition-pruned variant as the scale path — both pure native column
expressions (``aggregate``/``zip_with`` dot products run in whole-stage
codegen; no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_to: int = 4) -> DataFrame:
    """Exact brute-force top-k by cosine vs a constant query vector.
    The scan + projection stays in codegen; top-k is a single
    ORDER BY/LIMIT the optimizer executes as TakeOrderedAndProject —
    no full sort at scale."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (embeddings
            .select(F.col(id_col),
                    F.round(cosine_similarity_col(vec_d, q), round_to)
                    .alias("cosine"))
            .orderBy(F.desc("cosine"), F.col(id_col))
            .limit(k))


def ivf_topk(embeddings: DataFrame, query_vec: list[float],
             query_label: int, k: int = 5, id_col: str = "vec_id",
             vec_col: str = "embedding", label_col: str = "label",
             round_to: int = 4) -> DataFrame:
    """IVF-style ANN: probe only the query's coarse partition (here the
    pre-assigned ``label`` plays the centroid-assignment role).  At scale
    the label is a k-means centroid id and the table is partitioned by
    it → partition pruning turns top-k into a single-partition scan."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (embeddings
            .where(F.col(label_col) == query_label)
            .select(F.col(id_col),
                    F.round(cosine_similarity_col(vec_d, q), round_to)
                    .alias("cosine"))
            .orderBy(F.desc("cosine"), F.col(id_col))
            .limit(k))


def knn_join_per_label(embeddings: DataFrame, k: int = 3,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       label_col: str = "label",
                       round_to: int = 4) -> DataFrame:
    """Per-label all-pairs top-k (bucketed brute force): the LSH/IVF
    bucket join pattern — pairs only form within a partition key, ranked
    by a window.  → (label, id_a, id_b, cosine, rank)."""
    a = embeddings.select(F.col(label_col).alias("label"),
                          F.col(id_col).alias("id_a"),
                          F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(label_col).alias("label"),
                          F.col(id_col).alias("id_b"),
                          F.col(vec_col).alias("vb"))
    va = F.transform(F.col("va"), lambda x: x.cast("double"))
    vb = F.transform(F.col("vb"), lambda x: x.cast("double"))
    pairs = (a.join(b, on="label")
             .where(F.col("id_a") < F.col("id_b"))
             .select("label", "id_a", "id_b",
                     F.round(cosine_similarity_col(va, vb), round_to)
                     .alias("cosine")))
    w = Window.partitionBy("label", "id_a").orderBy(F.desc("cosine"), "id_b")
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
