"""SPECIALIST Lexicon source (SURVEY.md §2.1 S5).

The reference loads NLM's pipe-delimited LRAGR table into a trie
(load_specialist_lex.py:94-224) for inflectional/spelling variant
lookups.  Public LRAGR format: ``EUI|inflected_form|cat|infl|base|...``.
Here: ``spark.read.csv(sep='|')`` → a broadcastable
``variants(base, variant, kind)`` table (the shape
operators/stages.variants expansion consumes)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LRAGR_COLS = ["eui", "inflected", "cat", "infl", "base", "cit"]


def load_lragr(spark: SparkSession, path: str) -> DataFrame:
    """→ variants(base, variant, kind='inflection'): every inflected
    form of a base plus the reverse direction (the reference indexes
    both lookups, load_specialist_lex.py:68-84)."""
    raw = (spark.read.option("sep", "|").csv(path)
           .toDF(*_LRAGR_COLS[:6]))
    fwd = (raw.select(F.col("base"), F.col("inflected").alias("variant"))
           .where(F.col("base").isNotNull()
                  & F.col("variant").isNotNull()
                  & (F.col("base") != F.col("variant"))))
    rev = fwd.select(F.col("variant").alias("base"),
                     F.col("base").alias("variant"))
    return (fwd.unionByName(rev).distinct()
            .withColumn("kind", F.lit("inflection")))


def load_spelling_variants(spark: SparkSession, path: str) -> DataFrame:
    """LRSPL spelling-variant table: ``EUI|variant|base``."""
    raw = spark.read.option("sep", "|").csv(path).toDF("eui", "variant", "base")
    fwd = raw.select("base", "variant").where(
        F.col("base").isNotNull() & (F.col("base") != F.col("variant")))
    rev = fwd.select(F.col("variant").alias("base"),
                     F.col("base").alias("variant"))
    return (fwd.unionByName(rev).distinct()
            .withColumn("kind", F.lit("spelling")))
