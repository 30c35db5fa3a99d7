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


# --------------------------------------------------------------- LEXICON
def parse_lexicon_bases(text: str) -> list[tuple[str, str]]:
    """The LEXICON flat file: ``{`` ... ``}`` records with ``entry=EUI``
    and ``base=...`` lines (load_specialist_lex.py:180-224; public NLM
    format).  → [(eui, base)]."""
    out: list[tuple[str, str]] = []
    eui = base = None
    for raw in text.splitlines():
        line = raw.strip()
        if line.startswith("{"):
            eui = base = None
            line = line[1:].strip()
        if line == "}":
            if eui and base:
                out.append((eui, base))
            eui = base = None
            continue
        if "=" in line:
            key, _, val = line.partition("=")
            if key == "entry":
                eui = val
            elif key == "base":
                base = val
    if eui and base:
        out.append((eui, base))
    return out


def load_lexicon_bases(spark: SparkSession, path: str) -> DataFrame:
    with open(path, encoding="utf-8") as f:
        rows = parse_lexicon_bases(f.read())
    return spark.createDataFrame(rows or [("", "")],
                                 "eui: string, base: string") \
        .where("eui != ''")


def load_lrnom(spark: SparkSession, path: str) -> DataFrame:
    """LRNOM nominalization table ``EUI|nominalization|...``
    (load_specialist_lex.py:120-137)."""
    return (spark.read.option("sep", "|").csv(path)
            .select(F.col("_c0").alias("eui"),
                    F.col("_c1").alias("nominalization"))
            .where(F.col("nominalization").isNotNull()).distinct())


def load_lrtrm(spark: SparkSession, path: str) -> DataFrame:
    """LRTRM trademark table ``EUI|...|chemical``
    (load_specialist_lex.py:101-118)."""
    return (spark.read.option("sep", "|").csv(path)
            .select(F.col("_c0").alias("eui"),
                    F.col("_c2").alias("trademark"))
            .where(F.col("trademark").isNotNull()).distinct())


def specialist_entries(spark: SparkSession, bases: DataFrame,
                       lragr_path: str | None = None,
                       lrspl_path: str | None = None,
                       lrnom_path: str | None = None,
                       lrtrm_path: str | None = None) -> DataFrame:
    """(eui, string, kind) — the EUI-keyed lexicon the reference builds
    in memory (load_specialist_lex.py:25-53): base + spelling +
    nominalization + inflection (+ trademark) strings per entry.  This
    long table IS the trie: a query matches an entry iff it equals one
    of its strings."""

    def col2(path: str) -> DataFrame:
        return (spark.read.option("sep", "|").csv(path)
                .select(F.col("_c0").alias("eui"),
                        F.col("_c1").alias("string"))
                .where(F.col("string").isNotNull()))

    parts = [bases.select("eui", F.col("base").alias("string"),
                          F.lit("base").alias("kind"))]
    if lragr_path is not None:
        # LRAGR rows equal to the base are skipped by the reference
        raw = (col2(lragr_path).join(bases, on="eui", how="left")
               .where(F.col("base").isNull()
                      | (F.col("string") != F.col("base")))
               .select("eui", "string"))
        parts.append(raw.withColumn("kind", F.lit("inflection")))
    if lrspl_path is not None:
        parts.append(col2(lrspl_path).withColumn("kind", F.lit("spelling")))
    if lrnom_path is not None:
        parts.append(load_lrnom(spark, lrnom_path)
                     .select("eui", F.col("nominalization").alias("string"))
                     .withColumn("kind", F.lit("nominalization")))
    if lrtrm_path is not None:
        parts.append(load_lrtrm(spark, lrtrm_path)
                     .select("eui", F.col("trademark").alias("string"))
                     .withColumn("kind", F.lit("trademark")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def variants_from_entries(entries: DataFrame,
                          kinds: tuple[str, ...] = ("base", "inflection",
                                                    "spelling")) -> DataFrame:
    """Query-side string → variant strings of the same EUI, mirroring
    SpecialistLexicon.inflection_variants / spelling_variants /
    nominalizations (load_specialist_lex.py:68-92): ANY entry string
    matches the query (the trie indexes them all); the returned variants
    are the base + the kind-specific strings.  → variants(base, variant,
    kind) in the shape stages' expansion consumes."""
    q = entries.select("eui", F.col("string").alias("base"))
    v = (entries.where(F.col("kind").isin(*kinds))
         .select("eui", F.col("string").alias("variant"),
                 F.col("kind")))
    return (q.join(v, on="eui")
            .where(F.col("base") != F.col("variant"))
            .select("base", "variant", "kind").distinct())
