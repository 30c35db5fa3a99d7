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


def ivf_build(embeddings: DataFrame, n_lists: int = 16,
              id_col: str = "vec_id", vec_col: str = "embedding",
              seed: int = 42):
    """Train a real IVF coarse quantizer: k-means centroids over the
    embedding column (pyspark.ml, deterministic seed), assign every
    vector its inverted-list id.

    Returns ``(assigned, centroids)`` where ``assigned`` is the input
    plus ``list_id`` — at scale written partitioned/bucketed by
    ``list_id`` so a probe is a partition-pruned scan — and
    ``centroids`` is the small (n_lists × dim) python list used
    driver-side to pick probe lists.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    feat = embeddings.withColumn("_features", array_to_vector(vec_d))
    km = KMeans(k=n_lists, seed=seed, featuresCol="_features",
                predictionCol="list_id")
    model = km.fit(feat)
    assigned = model.transform(feat).drop("_features")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_probe(assigned: DataFrame, centroids: list[list[float]],
              query_vec: list[float], k: int = 5, nprobe: int = 2,
              id_col: str = "vec_id", vec_col: str = "embedding",
              round_to: int = 4) -> DataFrame:
    """ANN probe over an ``ivf_build`` index: rank centroids by cosine
    to the query (driver-side — n_lists × dim floats, bounded), scan
    only the ``nprobe`` nearest inverted lists, exact top-k within.
    With list-partitioned storage the `isin` filter partition-prunes,
    so the probe touches nprobe/n_lists of the data."""
    import math

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na and nb else 0.0

    ranked = sorted(range(len(centroids)),
                    key=lambda i: -cos(centroids[i], query_vec))
    probe_lists = ranked[:nprobe]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (assigned
            .where(F.col("list_id").isin(probe_lists))
            .select(F.col(id_col),
                    F.round(cosine_similarity_col(vec_d, q), round_to)
                    .alias("cosine"))
            .orderBy(F.desc("cosine"), F.col(id_col))
            .limit(k))


def lsh_planes(n_bits: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Seeded Gaussian hyperplanes — the shared deterministic source for
    lsh_ivf_assign AND any independent re-implementation (e.g. a SQL
    oracle embedding the same literals)."""
    import random
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)]
            for _ in range(n_bits)]


def lsh_ivf_assign(embeddings: DataFrame, n_bits: int = 4, seed: int = 7,
                   vec_col: str = "embedding") -> tuple[DataFrame, list]:
    """Deterministic LSH coarse quantizer (the IVF scale path whose
    assignment is REPRODUCIBLE bit-for-bit): ``n_bits`` signed random
    projections (hyperplanes from a seeded PRNG, shipped as literal
    arrays) → ``list_id`` ∈ [0, 2^n_bits).

    Unlike an iteratively-trained k-means quantizer (ivf_build), the
    assignment is pure per-row arithmetic — no distributed aggregation
    whose floating-point combine order could flip a centroid — so the
    same input always lands in the same list on any cluster layout.
    Returns (assigned, hyperplanes)."""
    first = embeddings.select(vec_col).first()
    dim = len(first[0]) if first else 0
    planes = lsh_planes(n_bits, dim, seed)
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    lid = F.lit(0)
    for j, p in enumerate(planes):
        pa = F.array(*[F.lit(float(x)) for x in p])
        bit = (_dot(vec_d, pa) >= 0).cast("int")
        lid = lid + bit * (1 << j)
    return embeddings.withColumn("list_id", lid), planes


def lsh_projection_margin(embeddings: DataFrame, planes: list,
                          vec_col: str = "embedding") -> float:
    """Smallest |dot(vec, plane)| over every row x plane — the margin
    that makes the q36 hash-exact dual-implementation oracle sound.

    ``lsh_ivf_assign`` (Spark SQL aggregate), ``lsh_ivf_probe``
    (Python left fold) and the DuckDB oracle (list_dot_product) may
    accumulate the same dot product in different floating-point
    orders; a projection whose true value sits within accumulation
    noise of zero (~dim * eps * sum|x*y|, ≈1e-12 for dim=64 unit-scale
    vectors) could round to different signs and flip a bucket bit.
    Asserting this margin >> that bound on the test corpora
    (tests/test_dedup_simsearch.py) guarantees all three fold orders
    agree on every sign, so the hash-exact comparison is deterministic
    rather than luck."""
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    per_plane = [F.abs(_dot(vec_d, F.array(*[F.lit(float(x)) for x in p])))
                 for p in planes]
    row_min = per_plane[0] if len(per_plane) == 1 else F.least(*per_plane)
    return embeddings.select(F.min(row_min).alias("m")).first()["m"]


def lsh_ivf_probe(assigned: DataFrame, planes: list,
                  query_vec: list[float], k: int = 5, radius: int = 1,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  round_to: int = 4) -> DataFrame:
    """Multi-probe over an ``lsh_ivf_assign`` index: scan the query's
    bucket plus every bucket within Hamming distance ``radius`` (the
    standard multi-probe LSH schedule), exact top-k within.  With
    list-partitioned storage the ``isin`` filter partition-prunes."""
    n_bits = len(planes)
    qbits = [int(sum(x * y for x, y in zip(query_vec, p)) >= 0)
             for p in planes]
    qid = sum(b << j for j, b in enumerate(qbits))
    probe_lists = [lid for lid in range(1 << n_bits)
                   if bin(lid ^ qid).count("1") <= radius]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (assigned
            .where(F.col("list_id").isin(probe_lists))
            .select(F.col(id_col),
                    F.round(cosine_similarity_col(vec_d, q), round_to)
                    .alias("cosine"))
            .orderBy(F.desc("cosine"), F.col(id_col))
            .limit(k))


def knn_join_per_label(embeddings: DataFrame, k: int = 3,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       label_col: str = "label",
                       round_to: int = 4,
                       max_label_size: int | None = None) -> DataFrame:
    """Per-label all-pairs top-k (bucketed brute force): the LSH/IVF
    bucket join pattern — pairs only form within a partition key, ranked
    by a window.  → (label, id_a, id_b, cosine, rank).

    ``max_label_size`` is the hot-key guard for the 100 TB path: a
    label holding m members forms m²/2 pairs, so one skewed label
    (all-English, a null-ish label) turns the bucketed join into
    all-pairs.  When set, each label keeps at most ``max_label_size``
    members — chosen deterministically by (hash, id) rank, so the same
    input yields the same subset on any partitioning — and the rest of
    that label is excluded from pairing (same contract as the
    ``max_bucket`` caps in dedup.py: drop the pathological bucket's
    tail rather than the job).  Default ``None`` preserves exact
    semantics (the q21 oracle path)."""
    if max_label_size is not None:
        wcap = Window.partitionBy(label_col).orderBy(
            F.pmod(F.hash(id_col), F.lit(2147483647)), id_col)
        embeddings = (embeddings
                      .withColumn("_cap_rank", F.row_number().over(wcap))
                      .where(F.col("_cap_rank") <= max_label_size)
                      .drop("_cap_rank"))
    # hoist the double cast + norm to ONE evaluation per row (same trick
    # as dedup.cosine_near_dup_pairs): the label join fans each vector
    # out O(label size) times, so computing them per pair multiplies the
    # HOF work on the hot path.  FP-identical to the per-pair form —
    # same arrays, same fold order, same `norm_a * norm_b` multiply
    # order — so the hash-exact q21 oracle is unaffected.
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = (embeddings
            .withColumn("_vd", vec_d)
            .withColumn("_n", _norm(F.col("_vd"))))
    a = base.select(F.col(label_col).alias("label"),
                    F.col(id_col).alias("id_a"),
                    F.col("_vd").alias("va"), F.col("_n").alias("na"))
    b = base.select(F.col(label_col).alias("label"),
                    F.col(id_col).alias("id_b"),
                    F.col("_vd").alias("vb"), F.col("_n").alias("nb"))
    pairs = (a.join(b, on="label")
             .where(F.col("id_a") < F.col("id_b"))
             .select("label", "id_a", "id_b",
                     F.round(_dot(F.col("va"), F.col("vb"))
                             / (F.col("na") * F.col("nb")), round_to)
                     .alias("cosine")))
    w = Window.partitionBy("label", "id_a").orderBy(F.desc("cosine"), "id_b")
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
