"""Offline lexicon-build jobs (J5/J6 + superterm links).

Regenerates the curated side tables the runtime pipeline consumes
(refdata.linked_terms / implied tables) from ontology tables, replacing
the reference's driver-side trie loops with set-based joins:

- ``linked_terms_table``     — cross-ontology same-string linking
  (setup_map_sra_to_ontology/link_ontologies.py:76-92)
- ``superterm_linked_table`` — terms linked to an ancestor's links
  (setup_map_sra_to_ontology/superterm_linked_terms.py:42-56)
- ``implications_table``     — token-subset implication mining
  (setup_map_sra_to_ontology/generate_implications.py:84-142)

Inputs are the ``sources.obo`` tables (terms / synonyms) plus the
``ancestors_closure`` output; all joins block on strings or tokens, so
they scale with executors — no driver-side loops over terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def term_strings(terms: DataFrame, synonyms: DataFrame,
                 syn_types: tuple[str, ...] = ("EXACT",),
                 nonmappable: list[str] | None = None) -> DataFrame:
    """(term_id, string): names + synonyms of the given types, optionally
    dropping nonmappable terms (the reference's get_mappable_terms trie
    side, link_ontologies.py:62-73)."""
    names = terms.select("term_id", F.col("name").alias("string"))
    syns = (synonyms.where(F.col("syn_type").isin(*syn_types))
            .select("term_id", F.col("syn_str").alias("string")))
    out = names.unionByName(syns).distinct()
    if nonmappable:
        out = out.where(~F.col("term_id").isin(*nonmappable))
    return out


def linked_terms_table(a_strings: DataFrame,
                       b_strings: DataFrame) -> DataFrame:
    """J5 (link_ontologies.py:76-92): for each b-term string equal to an
    a-term string, link b → a.  → (term_id, linked_id) with term_id from
    b, linked_id from a.  One string equi-join; the trie is unnecessary
    when both sides are relations."""
    a = a_strings.select(F.col("term_id").alias("linked_id"), "string")
    b = b_strings.select("term_id", "string")
    return (b.join(a, on="string")
            .where(F.col("term_id") != F.col("linked_id"))
            .select("term_id", "linked_id").distinct())


def superterm_linked_table(ancestors: DataFrame, linked_terms: DataFrame,
                           terms: DataFrame | None = None) -> DataFrame:
    """Superterm-linked terms (superterm_linked_terms.py:42-56): t is
    linked to everything its is_a/part_of superterms (including t itself
    — recursive_relationship gathers the seed, ontology_graph.py:133-156)
    are linked to.  → (term_id, linked_id).  ``terms`` supplies the term
    universe for the self-pairs (the reference iterates og.id_to_term);
    without it, ids seen anywhere in ancestors/linked_terms are used."""
    if terms is not None:
        universe = terms.select("term_id").distinct()
    else:
        universe = (ancestors.select("term_id")
                    .unionByName(ancestors.select(F.col("anc_id")
                                                  .alias("term_id")))
                    .unionByName(linked_terms.select("term_id"))
                    .distinct())
    sup = (ancestors.select("term_id", "anc_id")
           .unionByName(universe.select("term_id", F.col("term_id")
                                        .alias("anc_id"))))
    lk = linked_terms.select(F.col("term_id").alias("anc_id"), "linked_id")
    return (sup.join(lk, on="anc_id")
            .where(F.col("term_id") != F.col("linked_id"))
            .select("term_id", "linked_id").distinct())


def implications_table(a_terms: DataFrame, a_synonyms: DataFrame,
                       b_terms: DataFrame, b_synonyms: DataFrame,
                       min_len: int = 3) -> DataFrame:
    """Implication mining (generate_implications.py:84-142): for b-terms
    absent from ontology a (no shared string at all), emit b → a when an
    a-string's tokens are all tokens of a b-string AND the a-string is a
    substring of it — "b is a more specific phrase containing a".

    Plan: anti-join to find absent b-terms (the trie probe), then a
    token-blocked join (block on the a-string's first token exploded
    against b-string tokens) with the full native containment recheck —
    never an all-pairs product.  → (term_id, implied_id), term_id = b.
    """
    a_str = term_strings(a_terms, a_synonyms, ("EXACT",))
    # "b in a" probe uses ALL b strings vs a's name+EXACT trie (:93-103)
    b_all = term_strings(b_terms, b_synonyms,
                         ("EXACT", "RELATED", "NARROW", "BROAD", "ENRICHED"))
    b_in_a = (b_all.join(a_str.select("string"), on="string", how="left_semi")
              .select("term_id").distinct())
    b_str = (term_strings(b_terms, b_synonyms, ("EXACT",))
             .join(b_in_a, on="term_id", how="left_anti"))

    tok = F.split("string", " ")
    a_tok = (a_str.where(F.length("string") >= min_len)
             .select(F.col("term_id").alias("implied_id"),
                     F.col("string").alias("a_str"), tok.alias("a_toks"))
             .withColumn("block", F.element_at("a_toks", 1)))
    b_tok = (b_str.where(F.length("string") >= min_len)
             .select("term_id", F.col("string").alias("b_str"),
                     tok.alias("b_toks"))
             .select("term_id", "b_str", "b_toks",
                     F.explode("b_toks").alias("block")).distinct())
    cand = a_tok.join(b_tok, on="block")
    hit = cand.where(
        (F.col("a_str") != F.col("b_str"))
        & F.col("b_str").contains(F.col("a_str"))
        & (F.size(F.array_except("a_toks", "b_toks")) == 0))
    return hit.select("term_id", "implied_id").distinct()
