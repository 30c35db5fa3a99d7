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
- ``filtered_key_only`` — the term's strings occur ONLY in values of
                         F1-blocklisted keys (e.g. "Cancer Institute"
                         inside `biomaterial_provider`): the reference's
                         KeyValueFilter_Stage drops those kv pairs
                         before any matching, so both engines miss them
                         by design.
- ``p4_blocked_key``   — a cell-line (CVCL) term whose occurrences sit
                         under keys like ``cell_line`` that map to no
                         EFO:0000322/324 node in EITHER engine (delimit
                         parts "cell"/"line" match nothing; the fuzzy
                         norm-dist 1/9 > 0.1 bound rejects
                         cell_line→"cell line"), so P4 deletes the
                         match — faithful reference behavior
                         (BlockCellLineNonCellLineKey_Stage), not an
                         engine bug.
- ``p3_suppressed_no_isa`` — every boundary occurrence of the term's
                         strings lies strictly INSIDE an occurrence of
                         a LONGER lexicon string (e.g. "breast cancer"
                         inside "breast cancer cell line"): subinterval
                         suppression (P3) removes the submatch in both
                         engines; the reference then re-adds the term
                         as an is_a ANCESTOR of the longer match — a
                         closure that needs the unvendored OBO DAG.
                         Structural, not an engine bug.
- ``reachable_engine`` — a ≥3-char lexicon string occurs free-standing
                         on token boundaries and the pipeline still
                         missed it: the honest engine-bug bucket.

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


def _boundary_spans(s: str, text: str) -> list[tuple[int, int]]:
    """[start, end) of every occurrence of ``s`` in ``text`` delimited
    by non-alnum chars."""
    return [(m.start(), m.end()) for m in re.finditer(
        r"(?<![0-9a-z])" + re.escape(s) + r"(?![0-9a-z])", text)]


def _token_boundary(s: str, text: str) -> bool:
    return bool(_boundary_spans(s, text))


def _all_contained(strings: list[str], text: str,
                   all_lex: list[str]) -> bool:
    """True when EVERY boundary occurrence of every string sits strictly
    inside a boundary occurrence of some LONGER lexicon string — the
    P3-suppression geometry."""
    covers: list[tuple[int, int]] = []
    for other in all_lex:
        covers.extend(_boundary_spans(other, text))
    for s in strings:
        for a, b in _boundary_spans(s, text):
            if not any(ca <= a and b <= cb and (cb - ca) > (b - a)
                       for ca, cb in covers):
                return False
    return True


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

    filter_keys = {r["key"] for r in ref.filter_keys.collect()}
    filter_values = {r["value"] for r in ref.filter_values.collect()}

    def _visible_kv(s: dict) -> list[tuple[str, str]]:
        return [(k, str(v)) for k, v in s["attributes"].items()
                if k not in filter_keys and str(v) not in filter_values]

    def _cell_line_key(key: str) -> bool:
        kl = key.lower()
        return ("cell line" in kl or "cell culture" in kl
                or kl == "cellline")

    all_lex = sorted({x for ss in reach.values() for x in ss
                      if x and len(x) >= 3})
    fn_cls = {"unreachable": 0, "filtered_key_only": 0,
              "substring_only": 0, "short_string": 0,
              "p4_blocked_key": 0, "p3_suppressed_no_isa": 0,
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
        vis = _visible_kv(s)
        vis_text = " | ".join(f"{k.lower()}: {v.lower()}" for k, v in vis)
        for t in exp - got:
            occurring = [x for x in reach.get(t, ()) if x and x in attr_text]
            vis_occ = [x for x in reach.get(t, ()) if x and x in vis_text]
            if not occurring:
                fn_cls["unreachable"] += 1
            elif not vis_occ:
                fn_cls["filtered_key_only"] += 1
            elif all(len(x) < 3 for x in vis_occ):
                fn_cls["short_string"] += 1
            elif not any(_token_boundary(x, vis_text)
                         for x in vis_occ if len(x) >= 3):
                fn_cls["substring_only"] += 1
            elif (t.startswith("CVCL")
                  and not any(_cell_line_key(k)
                              and any(x in f"{k.lower()}: {v.lower()}"
                                      for x in vis_occ)
                              for k, v in vis)):
                fn_cls["p4_blocked_key"] += 1
            elif _all_contained([x for x in vis_occ if len(x) >= 3],
                                vis_text, all_lex):
                fn_cls["p3_suppressed_no_isa"] += 1
            else:
                fn_cls["reachable_engine"] += 1
                if len(fn_engine_examples) < 25:
                    fn_engine_examples.append(
                        (did, t, sorted(vis_occ, key=len)[-1]))
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
