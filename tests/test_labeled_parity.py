"""Parity floor against the reference's hand-labeled sample set.

Runs the mapping pipeline over a deterministic subset of the 206
hand-annotated samples (analysis_data/term_mapping) with the
annotation-synthesized lexicon (metasra_pipeline_spark.parity) and
asserts metric floors, so lexicon/matching/inference regressions
surface as parity drops.  The full-set numbers live in PARITY.md.
"""

import os

import pytest

LABELED = ("/root/reference/analysis_data/term_mapping/"
           "test_ontology_mapping_data.json")

pytestmark = pytest.mark.skipif(
    not os.path.exists(LABELED),
    reason="reference labeled data not present")


def test_labeled_subset_parity_floors(spark):
    from metasra_pipeline_spark.parity import (
        load_labeled_samples,
        score_parity,
    )
    samples = load_labeled_samples()[:40]
    m = score_parity(spark, samples)
    # reachable micro-F1: scored only on terms whose lexicon string
    # actually occurs in the sample text (the subset the synthesized
    # no-OBO lexicon can possibly find — see parity.py docstring).
    # Floors raised round 5 (measured 0.7564 / 0.7895 on this subset
    # after publication-mined synonyms + case-folding + EFO-family
    # fuzzy) to pin the gains against regression.
    assert m["terms_reachable_micro"]["f1"] >= 0.74, m["terms_reachable_micro"]
    assert m["terms_micro"]["precision"] >= 0.75, m["terms_micro"]
    # measured 0.8125 on this subset (0.8148 full-set, PARITY.md) after
    # the round-4 rv work: explicit-only comparison, UO/CVCL fuzzy,
    # T10 delta exact pass, 721->724 preference, curated unit plurals
    assert m["real_values_micro"]["f1"] >= 0.70, m["real_values_micro"]


def test_classifier_split_accuracy_floor(spark):
    """C1-C6 trained on the reference's published train split must hold
    its measured accuracy on the published test split."""
    split = "/root/reference/analysis_data/predict_sample_type"
    if not os.path.exists(os.path.join(split, "train_data.json")):
        pytest.skip("reference split not present")
    from metasra_pipeline_spark.parity import classifier_split_accuracy
    acc = classifier_split_accuracy(spark)
    assert acc["accuracy"] >= 0.78, acc
