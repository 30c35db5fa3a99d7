"""Sample-type classifier (SURVEY.md §2.9, C1–C6).

The reference trains per-class sklearn L1 logistic regressions over
n-gram count features + binary ontology-term features and applies
domain-rule overrides (predict_sample_type/learn_classifier.py:231-388,
one_vs_rest_classifier_same_features.py:82-272).  Re-architected
Spark-first:

- featurization (C1/C2) is native: delimiters → space, lowercase,
  uni+bigrams (shared shape with the mapping tokenizer), hashed count
  vectors + binary term vector via pyspark.ml;
- training/scoring (C3/C4) uses pyspark.ml multinomial LogisticRegression
  — JVM-side vectorized scoring, no sklearn unpickling on executors
  (run_sample_type_predictor.py:21-29's pickle load is replaced, not
  ported);
- rule overrides (C5) and confidence normalization + argmax (C6) are
  when/otherwise column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SAMPLE_TYPES = ["cell_line", "tissue", "primary_cells", "stem_cells",
                "in_vitro_differentiated_cells",
                "induced_pluripotent_stem_cells"]


def doc_feature_text(kv: DataFrame) -> DataFrame:
    """(doc_id, ftext) — keys + values, delimiters ``_/-`` → space,
    lowercased (learn_classifier.py:231-244 shape)."""
    blob = F.concat_ws(" ", F.col("key"), F.col("value"))
    cleaned = F.lower(F.regexp_replace(blob, r"[_/\-]", " "))
    return (kv.groupBy("doc_id")
            .agg(F.concat_ws(" ", F.collect_list(cleaned)).alias("ftext")))


def _assemble(features_df: DataFrame, terms: DataFrame | None,
              n_features: int = 4096):
    from pyspark.ml.feature import HashingTF, NGram, Tokenizer
    from pyspark.ml import Pipeline as MLPipeline
    stages = [Tokenizer(inputCol="ftext", outputCol="words"),
              NGram(n=2, inputCol="words", outputCol="bigrams")]
    pre = MLPipeline(stages=stages).fit(features_df)
    df = pre.transform(features_df).withColumn(
        "grams", F.concat(F.col("words"), F.col("bigrams")))
    tf = HashingTF(inputCol="grams", outputCol="features",
                   numFeatures=n_features)
    out = tf.transform(df)
    if terms is not None:
        term_text = (terms.groupBy("doc_id")
                     .agg(F.concat_ws(" ", F.collect_set("term_id"))
                          .alias("tt")))
        out = (out.join(term_text, on="doc_id", how="left")
               .fillna({"tt": ""}))
        # hashed binary term features folded into the same space via a
        # second HashingTF + VectorAssembler
        from pyspark.ml.feature import VectorAssembler
        ttf = HashingTF(inputCol="tt_words", outputCol="tfeat",
                        numFeatures=512, binary=True)
        out = out.withColumn("tt_words", F.split("tt", " "))
        out = ttf.transform(out)
        out = VectorAssembler(inputCols=["features", "tfeat"],
                              outputCol="all_features").transform(out) \
            .drop("features").withColumnRenamed("all_features", "features")
    return out.select("doc_id", "features")


def train_sample_type_model(kv: DataFrame, labels: DataFrame,
                            mapped_terms: DataFrame | None = None,
                            n_features: int = 4096):
    """labels: (doc_id, sample_type).  Returns (model, label_list)."""
    from pyspark.ml.classification import LogisticRegression
    feats = _assemble(doc_feature_text(kv), mapped_terms, n_features)
    label_list = sorted({r["sample_type"] for r in
                         labels.select("sample_type").distinct().collect()})
    idx = F.array(*[F.lit(x) for x in label_list])
    train = (feats.join(labels, on="doc_id")
             .withColumn("label",
                         F.array_position(idx, F.col("sample_type")) - 1)
             .withColumn("label", F.col("label").cast("double")))
    lr = LogisticRegression(maxIter=60, regParam=0.01,
                            elasticNetParam=1.0,  # L1, as the reference
                            family="multinomial")
    return lr.fit(train), label_list


# Cellosaurus subset → allowed sample types
# (one_vs_rest_classifier_same_features.py:140-170)
CVCL_SUBSET_TYPES = {
    "Induced_pluripotent_stem_cell": ["in_vitro_differentiated_cells",
                                      "induced_pluripotent_stem_cells"],
    "Cancer_cell_line": ["cell_line"],
    "Transformed_cell_line": ["cell_line"],
    "Finite_cell_line": ["cell_line"],
    "Spontaneously_cell_line": ["cell_line"],
    "Embryonic_stem_cell": ["stem_cells", "in_vitro_differentiated_cells"],
    "Telomerase_cell_line": ["cell_line"],
    "Conditionally_cell_line": ["cell_line"],
    "Hybridoma": ["cell_line"],
}


def _rule_flags(kv: DataFrame, mapped_terms: DataFrame | None,
                real_values: DataFrame | None,
                cvcl_subsets: DataFrame | None) -> DataFrame:
    """Per-doc boolean rule inputs (C5,
    one_vs_rest_classifier_same_features.py:185-254): xenograft term,
    passage-number real value, Cellosaurus-subset allowed types, and the
    stem-cell / specific-cell-type / primary-culture term flags."""
    docs = kv.select("doc_id").distinct()

    def flag(df, name):
        return df.select("doc_id").distinct().withColumn(name, F.lit(True))

    mt = mapped_terms if mapped_terms is not None else \
        docs.limit(0).withColumn("term_id", F.lit(""))
    out = (docs
           .join(flag(mt.where(F.col("term_id") == "EFO:0003942"),
                      "is_xeno"), "doc_id", "left")
           .join(flag(mt.where(F.col("term_id") == "CL:0000034"),
                      "has_stem"), "doc_id", "left")
           .join(flag(mt.where(F.col("term_id") == "CL:0002371"),
                      "has_celltype"), "doc_id", "left")
           .join(flag(mt.where(F.col("term_id") == "CL:0000001"),
                      "has_primary"), "doc_id", "left"))
    if real_values is not None:
        passaged = real_values.where(
            (F.col("property_id") == "EFO:0007061")
            & (F.col("unit_id") == "UO:0000189"))
        out = (out
               .join(flag(passaged, "is_passaged"), "doc_id", "left")
               .join(flag(passaged.where(F.col("value") > 0),
                          "passaged_pos"), "doc_id", "left"))
    else:
        out = (out.withColumn("is_passaged", F.lit(None).cast("boolean"))
               .withColumn("passaged_pos", F.lit(None).cast("boolean")))
    # Cellosaurus subset masks: for each mapped CVCL term's known subset,
    # types outside the subset's allowed list are zeroed (cumulative over
    # all subsets ≡ per-type max of "not allowed")
    if cvcl_subsets is not None and mapped_terms is not None:
        sub_rows = (mapped_terms
                    .join(F.broadcast(cvcl_subsets),
                          mapped_terms.term_id == cvcl_subsets.cvcl_id)
                    .where(F.col("subset").isin(*CVCL_SUBSET_TYPES))
                    .select("doc_id", "subset"))
        aggs = [F.lit(True).alias("found_clt")]
        for typ in SAMPLE_TYPES:
            aggs.append(F.max(
                ~F.col("subset").isin(*[s for s, ok in
                                        CVCL_SUBSET_TYPES.items()
                                        if typ in ok]) if any(
                    typ in ok for ok in CVCL_SUBSET_TYPES.values())
                else F.lit(True)).alias(f"cvclzero_{typ}"))
        sub_flags = sub_rows.groupBy("doc_id").agg(*aggs)
        out = out.join(sub_flags, "doc_id", "left")
    else:
        out = out.withColumn("found_clt", F.lit(None).cast("boolean"))
        for typ in SAMPLE_TYPES:
            out = out.withColumn(f"cvclzero_{typ}",
                                 F.lit(None).cast("boolean"))
    fill = {c: False for c in
            ["is_xeno", "has_stem", "has_celltype", "has_primary",
             "is_passaged", "passaged_pos", "found_clt"]
            + [f"cvclzero_{t}" for t in SAMPLE_TYPES]}
    return out.fillna(fill)


def predict_sample_type(model, label_list: list[str], kv: DataFrame,
                        mapped_terms: DataFrame | None = None,
                        real_values: DataFrame | None = None,
                        cvcl_subsets: DataFrame | None = None,
                        n_features: int = 4096,
                        terms_as_features: bool = False) -> DataFrame:
    """→ (doc_id, sample_type, confidence).

    C5/C6 exactly as the reference applies them
    (one_vs_rest_classifier_same_features.py:185-272): the rules ZERO
    per-class confidences (they never hard-assign a class), then the
    surviving vector is renormalized and argmaxed.  All masks are native
    column expressions over the probability array.

    ``terms_as_features`` must match how the model was trained (term
    features change the vector width); the C5 rules consume
    ``mapped_terms`` either way, like the reference's ``predicted_terms``
    argument."""
    from pyspark.ml.functions import vector_to_array
    feats = _assemble(doc_feature_text(kv),
                      mapped_terms if terms_as_features else None,
                      n_features)
    pred = (model.transform(feats)
            .select("doc_id", vector_to_array("probability").alias("probs")))
    pred = pred.join(_rule_flags(kv, mapped_terms, real_values,
                                 cvcl_subsets), on="doc_id", how="left")

    xeno = F.col("is_xeno")
    no_clt = ~xeno & ~F.col("found_clt")
    masks = []
    for i, typ in enumerate(label_list):
        zero = F.lit(False)
        if typ != "tissue":
            zero = zero | xeno                               # :190-196
        if typ == "tissue":
            zero = zero | (~xeno & F.col("is_passaged"))     # :198-207
        if typ == "primary_cells":
            zero = zero | (~xeno & F.col("passaged_pos"))
        if typ in SAMPLE_TYPES:
            zero = zero | (~xeno & F.col(f"cvclzero_{typ}")
                           & F.col("found_clt"))             # :209-226
        if typ in ("cell_line", "tissue", "primary_cells"):
            zero = zero | (no_clt & F.col("has_stem"))       # :231-237
        if typ == "tissue":
            zero = zero | (no_clt & ~F.col("has_stem")
                           & F.col("has_celltype"))          # :238-244
        if typ in ("tissue", "cell_line", "induced_pluripotent_stem_cells",
                   "in_vitro_differentiated_cells"):
            zero = zero | (no_clt & F.col("has_primary")
                           & ~F.col("is_passaged"))          # :246-254
        masks.append(F.when(zero, F.lit(0.0))
                     .otherwise(F.element_at("probs", i + 1)))
    masked = F.array(*masks)
    total = F.aggregate(masked, F.lit(0.0), lambda a, x: a + x)
    normed = F.when(total > 0,
                    F.transform(masked, lambda x: x / total)
                    ).otherwise(masked)                      # :257-264
    labels_arr = F.array(*[F.lit(x) for x in label_list])
    out = (pred.withColumn("normed", normed)
           .select("doc_id",
                   F.element_at(
                       labels_arr,
                       F.expr("array_position(normed, array_max(normed))")
                       .cast("int")).alias("sample_type"),
                   F.round(F.array_max("normed"), 4).alias("confidence")))
    return out
