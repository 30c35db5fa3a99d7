"""Entity-resolution layer: similarity kernels, connected components,
and the pairwise-F1 ≥ 0.99 gate (BASELINE.json north_rule)."""

import pytest

from metasra_pipeline_spark.datagen import synth_documents
from metasra_pipeline_spark.er.resolution import (
    connected_components,
    pairwise_f1,
    resolve_entities,
)
from metasra_pipeline_spark.functions.similarity import (
    jaro_winkler,
    levenshtein,
    pair_score,
    token_set_jaccard,
)


def test_similarity_kernels():
    assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611, abs=1e-3)
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("abc", "xyz") == 0.0
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert token_set_jaccard(["a", "b"], ["b", "c"]) == pytest.approx(1 / 3)
    assert pair_score("same text", "same text",
                      ["same", "text"], ["same", "text"]) == pytest.approx(1.0)


def test_connected_components_vs_python_union_find(spark):
    import random
    rng = random.Random(7)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]

    # ground truth: plain union-find
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {}
    for n in nodes:
        truth.setdefault(find(n), set()).add(n)
    expected = {n: min(comp) for comp in truth.values() for n in comp
                if len(comp) > 1 or any(n in e for e in edges)}

    e_df = spark.createDataFrame(edges, "doc_a: string, doc_b: string")
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(e_df).collect()}
    touched = {x for e in edges for x in e}
    assert got == {n: min_root for n, min_root in
                   ((n, min(c)) for c in truth.values() if c & touched
                    for n in c) if n in touched}


def test_er_f1_gate(spark):
    """The north_rule gate: pairwise F1 ≥ 0.99 on labeled pairs sharing a
    blocking key, against the generator's ground-truth entities."""
    gen = synth_documents(spark, 300, seed=42).localCheckpoint()
    docs = gen.select("doc_id", "spans")
    truth = gen.select("doc_id", "entity_id")
    res = resolve_entities(spark, docs, threshold=0.65)
    m = pairwise_f1(res["pairs"], truth, threshold=0.65)
    assert m["f1"] >= 0.99, m
    # clusters must cover every document exactly once
    clusters = res["clusters"]
    assert clusters.count() == 300
    assert clusters.select("doc_id").distinct().count() == 300


def test_cc_salted_join_equivalence(spark):
    """Explicit salting of the CC self-joins (functions/skew.py) must
    yield the same labels as the AQE-default path, on a graph with a
    deliberate hub (one node linked to 80 others) plus random edges."""
    import random
    rng = random.Random(11)
    nodes = [f"s{i:03d}" for i in range(120)]
    edges = [("s000", n) for n in nodes[1:81]]  # hub: degree 80
    edges += [(rng.choice(nodes), rng.choice(nodes)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    e_df = spark.createDataFrame(edges, "doc_a: string, doc_b: string")
    plain = {r["doc_id"]: r["cluster_id"]
             for r in connected_components(e_df).collect()}
    salted = {r["doc_id"]: r["cluster_id"]
              for r in connected_components(e_df, num_salts=4).collect()}
    assert salted == plain and len(plain) > 0


def test_salted_join_multiset_equality(spark):
    """salted_join == plain join (row multiset) for inner and left, on
    keys with skewed fan-out and keys absent from the small side."""
    from collections import Counter

    from metasra_pipeline_spark.functions.skew import salted_join
    big = spark.createDataFrame(
        [("hot", i) for i in range(200)]
        + [("cold", i) for i in range(3)]
        + [("orphan", i) for i in range(2)],
        "k: string, payload: int")
    small = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("unused", "U")], "k: string, tag: string")
    for how in ("inner", "left"):
        exp = Counter(map(tuple, big.join(small, on="k", how=how).collect()))
        got = Counter(map(tuple,
                          salted_join(big, small, "k", num_salts=5,
                                      how=how).collect()))
        assert got == exp, how


def test_resolve_entities_native_covers_and_is_deterministic(spark):
    """The SQL-expressible native-scorer config (q93's engine side):
    every doc labeled exactly once, labels deterministic across runs,
    exact-duplicate docs always co-clustered (star edges bypass
    blocking), and it resolves the same synthetic entities as the
    kernel config at high F1."""
    from metasra_pipeline_spark.er.resolution import resolve_entities_native
    gen = synth_documents(spark, 300, seed=42).localCheckpoint()
    docs = gen.select("doc_id", "spans")
    truth = gen.select("doc_id", "entity_id")
    res = resolve_entities_native(spark, docs)
    clusters = res["clusters"]
    assert clusters.count() == 300
    assert clusters.select("doc_id").distinct().count() == 300
    again = resolve_entities_native(spark, docs)["clusters"]
    assert {tuple(r) for r in clusters.collect()} \
        == {tuple(r) for r in again.collect()}
    m = pairwise_f1(res["pairs"], truth, threshold=0.65)
    assert m["f1"] >= 0.95, m


def test_candidate_pairs_rare_key_bypass(spark):
    """Rare-key meta-blocking bypass (BENCH/ANALYSIS.md round-5 recall
    cliff): one shared key with df <= rare_df admits a pair that
    min_shared=2 alone would prune; one shared MID-frequency key
    (df > rare_df) still prunes; two shared keys admit regardless."""
    from metasra_pipeline_spark.er.resolution import candidate_pairs

    rows = []
    # d1,d2 share ONLY the rare key "id123" (df=2)
    rows += [("d1", "id123"), ("d2", "id123")]
    # d3,d4 share ONLY the mid-frequency key "mid" (df=20 via fillers)
    rows += [("d3", "mid"), ("d4", "mid")]
    rows += [(f"f{i:02d}", "mid") for i in range(18)]
    # d5,d6 share TWO mid-frequency keys -> admitted by min_shared
    rows += [("d5", "mid"), ("d6", "mid"),
             ("d5", "mid2"), ("d6", "mid2")]
    rows += [(f"g{i:02d}", "mid2") for i in range(18)]
    keys = spark.createDataFrame(rows, "doc_id: string, key: string")

    got = {(r.doc_a, r.doc_b)
           for r in candidate_pairs(keys, min_shared=2, rare_df=16)
           .collect()}
    assert ("d1", "d2") in got            # rare-key bypass
    assert ("d3", "d4") not in got        # single mid-df key still pruned
    assert ("d5", "d6") in got            # min_shared path intact
    # fillers share one mid-df key each -> none admitted
    assert not any(a.startswith("f") and b.startswith("f")
                   for a, b in got)

    # rare_df=0 disables the bypass entirely
    got0 = {(r.doc_a, r.doc_b)
            for r in candidate_pairs(keys, min_shared=2, rare_df=0)
            .collect()}
    assert ("d1", "d2") not in got0 and ("d5", "d6") in got0


def test_delta_candidate_pairs_rare_key_bypass(spark):
    """The incremental path honors the same bypass via the combined-df
    table, keeping the batch<->incremental pair-formation invariant."""
    from pyspark.sql import functions as F

    from metasra_pipeline_spark.er.incremental import delta_candidate_pairs

    new_rows = [("n1", "id123"), ("n2", "mid")]
    base_rows = [("b1", "id123"), ("b2", "mid")]
    base_rows += [(f"f{i:02d}", "mid") for i in range(18)]
    new_keys = spark.createDataFrame(new_rows, "doc_id: string, key: string")
    base_keys = spark.createDataFrame(base_rows, "doc_id: string, key: string")
    sizes = (new_keys.unionByName(base_keys).groupBy("key")
             .agg(F.countDistinct("doc_id").alias("n_docs")))

    got = {(r.doc_a, r.doc_b)
           for r in delta_candidate_pairs(new_keys, base_keys, min_shared=2,
                                          key_df=sizes, rare_df=16)
           .collect()}
    assert ("b1", "n1") in got            # rare shared key, new x base
    assert ("b2", "n2") not in got        # mid-df single key still pruned
