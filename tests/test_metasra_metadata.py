"""Reference-metadata-directory loader (public curated JSON formats)."""

import os

import pytest

from metasra_pipeline_spark.sources.metasra_metadata import (
    CELL_LINE_KEYS,
    load_metadata_dir,
    merge_lexicon,
)

REF_MD = "/root/reference/map_sra_to_ontology"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_MD, "metadata")),
    reason="reference metadata dir not present")


def test_load_metadata_dir_shapes():
    raw = load_metadata_dir(REF_MD)
    # spot checks against known public entries
    assert "human embryonic stem cell" in raw["acronyms"]["hESC"]
    assert raw["consequent_terms"]["EFO_BTO:0000214"] == ["CL:0000010"]
    assert "CVCL:9773" in raw["two_char"]["H9"]
    assert "study design" in raw["filter_keys"]
    assert ["m", "male", "man"] in raw["prop_syn_sets"]["EFO_PATO:0000047"]
    assert "EFO:0000246" in raw["real_value_properties"]["property_term_ids"]
    combo = raw["term_artifact_combos"][0]
    assert combo["required_terms"] == ["CL:0000084"]
    assert combo["consequent_term"] == "CL:0000624"
    assert raw["cvcl_mappings"]["CVCL:0002"]["real_value_properties"]
    assert any("tumour" in s for s in raw["syn_sets"])
    assert raw["cell_line_keys"] == CELL_LINE_KEYS


def test_metadata_drives_pipeline(spark):
    """The curated tables (real reference metadata) drive the engine with
    a minimal merged lexicon: the T-cell + CD4+ artifact combo fires with
    the REAL term_artifact_combo table."""
    from metasra_pipeline_spark.datagen import docs_from_kv
    from metasra_pipeline_spark.plans.pipeline import run_mapping_pipeline
    from metasra_pipeline_spark.refdata import refdata_from_raw

    raw = load_metadata_dir(REF_MD)
    raw = merge_lexicon(
        raw,
        terms=[{"id": "CL:0000084", "ont": "CL", "name": "T cell",
                "syns": []},
               {"id": "CL:0000624", "ont": "CL",
                "name": "CD4-positive, alpha-beta T cell", "syns": []},
               {"id": "EFO:0000324", "ont": "EFO", "name": "cell type",
                "syns": []}],
        ancestors=[],
        exact_match_onts=["CL", "EFO"],
        fuzzy_match_onts=[],
        mappable_prefixes=["CL", "EFO", "EFO_BTO", "UBERON", "DOID",
                           "EFO_PATO"])
    ref = refdata_from_raw(spark, raw)
    docs = docs_from_kv(spark, [
        ("m1", [("cell type", "T cell"), ("marker", "CD4+")])])
    res = run_mapping_pipeline(spark, docs, ref)
    mapped = {(r["term_id"], r["consequent"])
              for r in res.mapped_terms.collect()}
    assert ("CL:0000084", False) in mapped
    assert ("CL:0000624", False) in mapped   # the combo fired
