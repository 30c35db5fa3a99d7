"""Text analysis operators: language-ID heuristic, quality scoring,
token counting, all as native column expressions over (id, text)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tiny deterministic stopword profiles for the n-gram/stopword
#: language-ID heuristic (order = tie-break priority)
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "and", "of", "to", "in", "is"]),
    ("de", ["der", "die", "und", "das", "nicht", "ist"]),
    ("fr", ["le", "la", "et", "les", "des", "est"]),
    ("es", ["el", "la", "de", "que", "los", "es"]),
]

_EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is",
                 "on", "for", "with"]


def _tok_array(text_col: str):
    return F.filter(F.split(F.lower(F.col(text_col)), r"[^0-9a-z]+"),
                    lambda t: F.length(t) > 0)


def token_counts(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, n_ws_tokens, n_subword_est, n_chars): whitespace token count
    plus a BPE-ish subword estimate (⌈len/4⌉ per token — the common
    chars-per-token heuristic)."""
    ts = _tok_array(text_col)
    return df.select(
        F.col(id_col),
        F.size(ts).alias("n_ws_tokens"),
        F.aggregate(ts, F.lit(0),
                    lambda acc, t: acc + F.ceil(F.length(t) / 4).cast("int"))
         .alias("n_subword_est"),
        F.length(text_col).alias("n_chars"))


def quality_scores(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, n_tokens, avg_token_len, stopword_ratio, quality) — the
    standard length/stopword/alpha-ratio quality heuristic, rounded for
    engine portability."""
    ts = _tok_array(text_col)
    n = F.size(ts)
    stop_hits = F.size(F.filter(ts, lambda t: t.isin(_EN_STOPWORDS)))
    avg_len = F.aggregate(ts, F.lit(0),
                          lambda acc, t: acc + F.length(t)) / n
    stop_ratio = stop_hits / n
    quality = (F.least(n / F.lit(50.0), F.lit(1.0)) * 0.4
               + F.least(avg_len / F.lit(6.0), F.lit(1.0)) * 0.3
               + F.least(stop_ratio * 5, F.lit(1.0)) * 0.3)

    def trunc4(c):
        # floor-truncation, not round: round() at a .xxxx5 boundary is
        # engine-dependent (decimal HALF_UP vs binary repr); floor of the
        # identical IEEE double is deterministic everywhere
        return F.floor(c * 10000) / 10000

    return (df.where(F.size(ts) > 0)
            .select(F.col(id_col),
                    n.alias("n_tokens"),
                    trunc4(avg_len).alias("avg_token_len"),
                    trunc4(stop_ratio).alias("stopword_ratio"),
                    trunc4(quality).alias("quality")))


def lang_id(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(id, pred_lang) — stopword-profile language ID; 'unknown' when no
    profile scores > 0; first profile in LANG_MARKERS wins ties."""
    ts = _tok_array(text_col)
    out = df.select(F.col(id_col), ts.alias("ts"))
    scores = [
        F.size(F.filter(F.col("ts"), lambda t: t.isin(markers)))
        .alias(f"s_{lang}")
        for lang, markers in LANG_MARKERS
    ]
    out = out.select(id_col, *scores)
    best = F.greatest(*[F.col(f"s_{lang}") for lang, _ in LANG_MARKERS])
    pred = F.when(best == 0, F.lit("unknown"))
    for lang, _ in LANG_MARKERS:
        pred = pred.when(F.col(f"s_{lang}") == best, F.lit(lang))
    return out.select(id_col, pred.alias("pred_lang"))
