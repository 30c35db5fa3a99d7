"""Final output surface: gather (A7), 3-table build (A8), JSON,
SQLite artifact, and the website term query."""

import json
import sqlite3

from metasra_pipeline_spark.outputs import (
    build_metasra_tables,
    gather_mappings,
    metasra_json,
    query_metasra_for_term,
    write_metasra_sqlite,
)


def _frames(spark):
    mapped = spark.createDataFrame(
        [("s1", "UBERON:0001379", False), ("s1", "CL:0000084", True),
         ("s2", "DOID:3459", False)],
        "doc_id: string, term_id: string, consequent: boolean")
    rv = spark.createDataFrame(
        [("s1", "EFO:0000246", 48.0, "UO:0000036", False)],
        "doc_id: string, property_id: string, value: double, "
        "unit_id: string, consequent: boolean")
    types = spark.createDataFrame(
        [("s1", "tissue", 0.93), ("s2", "cell_line", 0.88)],
        "doc_id: string, sample_type: string, confidence: double")
    return mapped, rv, types


def test_gather_and_tables(spark):
    mapped, rv, types = _frames(spark)
    # A7: two identical job outputs collapse to one logical table
    g_mapped, g_rv = gather_mappings([(mapped, rv), (mapped, rv)])
    assert g_mapped.count() == 3 and g_rv.count() == 1

    t = build_metasra_tables(g_mapped, g_rv, types)
    terms = {(r["sample_accession"], r["term_id"])
             for r in t["mapped_ontology_terms"].collect()}
    assert ("s1", "UBERON:0001379") in terms and len(terms) == 3
    st = {r["sample_accession"]: (r["sample_type"], r["confidence"])
          for r in t["sample_type"].collect()}
    # raw label → display name (build_metasra_database_files.py:77-83)
    assert st["s2"] == ("cell line", 0.88)
    assert st["s1"] == ("tissue", 0.93)


def test_sqlite_artifact_and_website_query(spark, tmp_path):
    mapped, rv, types = _frames(spark)
    t = build_metasra_tables(mapped, rv, types)
    db = str(tmp_path / "metasra.sqlite")
    write_metasra_sqlite(t, db)
    with sqlite3.connect(db) as conn:
        n = conn.execute(
            "SELECT count(*) FROM mapped_ontology_terms").fetchone()[0]
        assert n == 3
        row = conn.execute(
            "SELECT sample_type FROM sample_type "
            "WHERE sample_accession='s2'").fetchone()
        assert row[0] == "cell line"

    meta = spark.createDataFrame(
        [("s2", "HeLa rep2", "SRP001")],
        "sample_accession: string, sample_name: string, "
        "study_accession: string")
    res = query_metasra_for_term(t, "DOID:3459", sample_type="cell line",
                                 sample_meta=meta).collect()
    assert len(res) == 1
    assert res[0]["sample_name"] == "HeLa rep2"
    none = query_metasra_for_term(t, "DOID:3459", sample_type="tissue")
    assert none.count() == 0


def test_metasra_json_shape(spark):
    mapped, rv, types = _frames(spark)
    out = {r["sample_accession"]: json.loads(r["json"])
           for r in metasra_json(mapped, rv, types).collect()}
    assert out["s1"]["mapped ontology terms"] == ["CL:0000084",
                                                  "UBERON:0001379"]
    assert out["s1"]["real-value properties"][0]["property_term_id"] \
        == "EFO:0000246"
    assert out["s1"]["sample type"] == "tissue"
    assert out["s2"]["real-value properties"] == []
