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


def predict_sample_type(model, label_list: list[str], kv: DataFrame,
                        mapped_terms: DataFrame | None = None,
                        real_values: DataFrame | None = None,
                        n_features: int = 4096) -> DataFrame:
    """→ (doc_id, sample_type, confidence) with C5 rule overrides."""
    from pyspark.ml.functions import vector_to_array
    feats = _assemble(doc_feature_text(kv), mapped_terms, n_features)
    pred = (model.transform(feats)
            .select("doc_id",
                    vector_to_array("probability").alias("probs")))
    labels_arr = F.array(*[F.lit(x) for x in label_list])
    out = pred.select(
        "doc_id",
        F.element_at(labels_arr,
                     (F.expr("array_position(probs, array_max(probs))"))
                     .cast("int")).alias("ml_type"),
        F.round(F.array_max("probs"), 4).alias("confidence"))

    # --- C5 domain-rule overrides (one_vs_rest_...py:185-254 analogues) ---
    ft = doc_feature_text(kv)
    has_xeno = ft.select(
        "doc_id", F.col("ftext").contains("xenograft").alias("is_xeno"))
    out = out.join(has_xeno, on="doc_id", how="left")
    if mapped_terms is not None:
        cvcl = (mapped_terms
                .where(F.split("term_id", ":").getItem(0) == "CVCL")
                .select("doc_id").distinct()
                .withColumn("has_cvcl", F.lit(True)))
        ipsc = (mapped_terms.where(F.col("term_id") == "EFO:0004905")
                .select("doc_id").distinct()
                .withColumn("has_ipsc", F.lit(True)))
        out = (out.join(cvcl, on="doc_id", how="left")
               .join(ipsc, on="doc_id", how="left"))
    else:
        out = (out.withColumn("has_cvcl", F.lit(None).cast("boolean"))
               .withColumn("has_ipsc", F.lit(None).cast("boolean")))

    sample_type = (
        F.when(F.col("is_xeno"), F.lit("tissue"))
        .when(F.col("has_ipsc"),
              F.lit("induced_pluripotent_stem_cells"))
        .when(F.col("has_cvcl"), F.lit("cell_line"))
        .otherwise(F.col("ml_type")))
    confidence = (F.when(F.col("is_xeno") | F.col("has_ipsc").isNotNull()
                         | F.col("has_cvcl").isNotNull(), F.lit(1.0))
                  .otherwise(F.col("confidence")))
    return out.select("doc_id", sample_type.alias("sample_type"),
                      confidence.alias("confidence"))
