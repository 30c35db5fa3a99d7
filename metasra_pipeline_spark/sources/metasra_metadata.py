"""Loader for the reference's curated metadata directory (S8 analogue).

A MetaSRA deployment carries a ``map_sra_to_ontology/metadata`` directory
of curated JSON files (acronyms, filter rules, cvcl mappings, …) plus
``synonym_sets/``.  This module reads those exact public formats into the
``raw`` dict :func:`metasra_pipeline_spark.refdata.refdata_from_raw`
consumes, so a user of the reference can point this engine at their
existing metadata checkout — the only extra inputs are the OBO ontology
releases (sources.obo + sources.ontology_config build the term lexicon;
the reference likewise ships empty ``obo/`` and ``LEX/`` directories and
has users download those).

File-format citations: pipeline_components.py:27-46 (the constant paths
and json.load sites) and the per-stage readers noted inline.
"""

from __future__ import annotations

import json
import os
from typing import Any

from ..refdata import EMPTY_RAW

#: hardcoded in the reference's stages, not in metadata files
CELL_LINE_KEYS = ["EFO:0000322", "EFO:0000324"]   # pipeline_components.py:466-469
TIME_KEYS = ["EFO:0000721", "EFO:0000724"]        # pipeline_components.py:1357


def _load(path: str, name: str) -> Any:
    with open(os.path.join(path, name), encoding="utf-8") as f:
        return json.load(f)


def load_metadata_dir(root: str) -> dict[str, Any]:
    """``root`` = the reference layout's ``map_sra_to_ontology`` dir
    (containing ``metadata/`` and ``synonym_sets/``).  Returns a raw
    refdata dict with every curated table populated; ``terms`` /
    ``ancestors`` stay empty until an ontology lexicon (OBO + config
    slicing) is merged in."""
    md = os.path.join(root, "metadata")
    raw = dict(EMPTY_RAW)

    raw["acronyms"] = _load(md, "acronym_to_expansions.json")
    raw["consequent_terms"] = _load(md, "custom_term_to_consequent_terms.json")
    raw["noun_phrases"] = _load(md, "noun_phrases.json")
    raw["two_char"] = _load(md, "two_char_mappings.json")

    fkv = _load(md, "filter_key_val_rules.json")
    raw["filter_keys"] = fkv["filter_keys"]
    raw["filter_values"] = fkv.get("filter_values", [])

    # {prop: [[syn, ...], ...]} — PropertySpecificSynonym sets
    raw["prop_syn_sets"] = _load(md, "has_val_syn_term_ids.json")

    # {cvcl: {mapped_terms: [...], real_value_properties: [[p, v, u]]}}
    raw["cvcl_mappings"] = _load(md, "cvcl_mappings.json")

    rvp = _load(md, "real_valued_properties.json")
    ids = rvp["property_term_ids"]
    raw["real_value_properties"] = {
        # the reference keeps {id: label}; the engine needs the id list
        "property_term_ids": list(ids) if isinstance(ids, dict) else ids,
        "default_units": rvp.get("default_units", {}),
    }

    # [{required_terms: {id: label}, required_artifacts: [[...]],
    #   consequent_term: id}] — dict keys iterate as the id list
    raw["term_artifact_combos"] = [
        {"required_terms": list(c["required_terms"]),
         "required_artifacts": c["required_artifacts"],
         "consequent_term": c["consequent_term"]}
        for c in _load(md, "term_artifact_combo.json")
    ]

    # synonym overlays applied at lexicon build (ontology_graph.py:193-222)
    raw["term_to_extra_synonyms"] = _load(md, "term_to_extra_synonyms.json")
    raw["term_to_remove_synonyms"] = _load(md, "term_to_remove_synonyms.json")

    syn_dir = os.path.join(root, "synonym_sets")
    syn_sets: list[list[str]] = []
    for fn in ("custom_syn_sets.json", "cvcl_syn_sets.json"):
        p = os.path.join(syn_dir, fn)
        if os.path.exists(p):
            with open(p, encoding="utf-8") as f:
                syn_sets.extend(json.load(f))
    raw["syn_sets"] = syn_sets

    raw["cell_line_keys"] = list(CELL_LINE_KEYS)
    raw["time_keys"] = list(TIME_KEYS)
    return raw


def merge_lexicon(raw: dict[str, Any], terms: list[dict],
                  ancestors: list[tuple[str, str, str]],
                  exact_match_onts: list[str],
                  fuzzy_match_onts: list[str],
                  mappable_prefixes: list[str],
                  nonmappable_terms: list[str] | None = None
                  ) -> dict[str, Any]:
    """Merge an ontology lexicon (sources.ontology_config
    ``lexicon_raw_terms`` output + ancestors closure) into a metadata
    raw dict → the complete refdata input."""
    out = dict(raw)
    out["terms"] = list(raw.get("terms", [])) + terms
    out["ancestors"] = list(raw.get("ancestors", [])) + list(ancestors)
    out["exact_match_onts"] = exact_match_onts
    out["fuzzy_match_onts"] = fuzzy_match_onts
    out["mappable_prefixes"] = mappable_prefixes
    if nonmappable_terms:
        out["nonmappable_terms"] = (list(raw.get("nonmappable_terms", []))
                                    + list(nonmappable_terms))
    return out
