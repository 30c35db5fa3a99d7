"""Attribute every residual parity error to a cause class.

Runs the labeled-set pipeline once, then classifies each false negative
and false positive so the 0.99-target gap is fully accounted for:

False negatives (expected term not predicted):
- ``unreachable``      — no lexicon string for the term occurs in the
                         sample's attribute text: structurally missing
                         input (the reference does not vendor its OBO
                         releases; only names/overlay/publication-mined
                         synonyms exist here).  NOT an engine bug.
- ``substring_only``   — a lexicon string occurs but never on token
                         boundaries (e.g. inside an accession code):
                         the reference's tokenizer would split the same
                         way; matching it would be a false positive
                         factory.
- ``short_string``     — every occurring string is < 3 chars (both
                         engines' exact/fuzzy guards skip those,
                         pipeline_components.py:810-813).
- ``reachable_engine`` — a ≥3-char lexicon string occurs on token
                         boundaries and the pipeline still missed it:
                         the honest engine-bug bucket.

False positives (predicted term not annotated):
- ``annotated_elsewhere`` — the SAME term is annotated in ≥1 other
                         labeled sample: the annotation set applies it
                         inconsistently, i.e. annotator skip, not an
                         engine hallucination.
- ``never_annotated``  — the term appears in no sample's annotation:
                         typically generic ontology terms the
                         annotators never assign (the reference prunes
                         some via OBO-derived exclude lists we lack).

Usage: python scripts/parity_residuals.py   (prints a markdown table)
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metasra_pipeline_spark.parity import (  # noqa: E402
    _doc_id,
    _expected_terms,
    _reachable_strings,
    build_labeled_refdata,
    load_labeled_samples,
    samples_to_docs,
)
from metasra_pipeline_spark.plans.pipeline import run_mapping_pipeline  # noqa: E402
from metasra_pipeline_spark.session import get_spark  # noqa: E402


def _token_boundary(s: str, text: str) -> bool:
    """True if ``s`` occurs in ``text`` delimited by non-alnum chars."""
    return re.search(r"(?<![0-9a-z])" + re.escape(s) + r"(?![0-9a-z])",
                     text) is not None


def main() -> None:
    spark = get_spark("parity_residuals", cores=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    samples = load_labeled_samples()
    ref = build_labeled_refdata(spark, samples)
    docs = samples_to_docs(spark, samples)
    res = run_mapping_pipeline(spark, docs, ref)
    pred: dict[str, set[str]] = {}
    for r in res.mapped_terms.select("doc_id", "term_id").collect():
        pred.setdefault(r["doc_id"], set()).add(r["term_id"])

    reach = _reachable_strings(ref)
    annotated_terms: dict[str, int] = {}
    for s in samples:
        for t in _expected_terms(s):
            annotated_terms[t] = annotated_terms.get(t, 0) + 1

    fn_cls = {"unreachable": 0, "substring_only": 0, "short_string": 0,
              "reachable_engine": 0}
    fp_cls = {"annotated_elsewhere": 0, "never_annotated": 0}
    fn_engine_examples: list[tuple[str, str, str]] = []
    fp_top: dict[str, int] = {}
    for i, s in enumerate(samples):
        did = _doc_id(s, i)
        exp = _expected_terms(s)
        got = pred.get(did, set())
        attr_text = " | ".join(str(v).lower()
                               for v in s["attributes"].values())
        for t in exp - got:
            occurring = [x for x in reach.get(t, ()) if x and x in attr_text]
            if not occurring:
                fn_cls["unreachable"] += 1
            elif all(len(x) < 3 for x in occurring):
                fn_cls["short_string"] += 1
            elif not any(_token_boundary(x, attr_text)
                         for x in occurring if len(x) >= 3):
                fn_cls["substring_only"] += 1
            else:
                fn_cls["reachable_engine"] += 1
                if len(fn_engine_examples) < 25:
                    fn_engine_examples.append(
                        (did, t, sorted(occurring, key=len)[-1]))
        for t in got - exp:
            if annotated_terms.get(t, 0) > 0:
                fp_cls["annotated_elsewhere"] += 1
            else:
                fp_cls["never_annotated"] += 1
            fp_top[t] = fp_top.get(t, 0) + 1

    n_fn = sum(fn_cls.values())
    n_fp = sum(fp_cls.values())
    print("\n| residual | class | count | share |")
    print("|---|---|---|---|")
    for k, v in fn_cls.items():
        print(f"| fn ({n_fn}) | {k} | {v} | {v / max(n_fn, 1):.1%} |")
    for k, v in fp_cls.items():
        print(f"| fp ({n_fp}) | {k} | {v} | {v / max(n_fp, 1):.1%} |")
    print("\nTop never-annotated fp terms (term, count):")
    never = {t: c for t, c in fp_top.items() if annotated_terms.get(t, 0) == 0}
    for t, c in sorted(never.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {t}: {c}")
    print("\nreachable_engine fn examples (doc, term, occurring string):")
    for did, t, x in fn_engine_examples:
        print(f"  {did} {t} '{x}'")


if __name__ == "__main__":
    main()
