"""Drug-drug interaction checking (kgnorm.interactions).

Mirrors reference drug_interactions.py: alias normalization, pairwise
lookup against the merged curated+expanded table, severity rollup.
"""

import pytest

from kgnorm import interactions


@pytest.fixture(scope="module")
def dim(spark):
    return interactions.interactions_dim(spark)


@pytest.fixture(scope="module")
def aliases():
    _rows, a = interactions.load_interaction_data()
    return a


def test_fixture_loaded():
    rows, aliases_ = interactions.load_interaction_data()
    assert len(rows) == 462  # core 40 + expanded fixture, dup pairs skipped
    assert aliases_["coumadin"] == "warfarin"


def test_contraindicated_pair(spark, dim, aliases):
    meds = spark.createDataFrame(
        [("P1", "simvastatin"), ("P1", "clarithromycin")], ["conv_id", "drug"]
    )
    got = interactions.check_interactions(meds, dim, aliases).collect()
    assert len(got) == 1
    assert got[0].severity == "contraindicated"


def test_alias_resolution_finds_interaction(spark, dim, aliases):
    # Coumadin → warfarin; warfarin + aspirin is a major interaction
    meds = spark.createDataFrame(
        [("P1", "Coumadin"), ("P1", "aspirin")], ["conv_id", "drug"]
    )
    got = interactions.check_interactions(meds, dim, aliases).collect()
    assert len(got) == 1
    assert {got[0].drug1, got[0].drug2} == {"warfarin", "aspirin"}
    assert got[0].severity == "major"


def test_no_self_or_duplicate_pairs(spark, dim, aliases):
    # tylenol and acetaminophen normalize to the same drug → no pair
    meds = spark.createDataFrame(
        [("P1", "Tylenol"), ("P1", "acetaminophen")], ["conv_id", "drug"]
    )
    assert interactions.check_interactions(meds, dim, aliases).count() == 0


def test_summary_rollup(spark, dim, aliases):
    meds = spark.createDataFrame(
        [("P1", "simvastatin"), ("P1", "clarithromycin"),
         ("P1", "warfarin"), ("P1", "aspirin"),
         ("P2", "metformin")],
        ["conv_id", "drug"],
    )
    found = interactions.check_interactions(meds, dim, aliases)
    s = {r.conv_id: r for r in interactions.interaction_summary(found).collect()}
    p1 = s["P1"]
    assert p1.has_contraindicated and p1.highest_severity == "contraindicated"
    assert p1.n_contraindicated >= 1 and p1.n_major >= 1
    assert "P2" not in s  # single med → no pairs → no rollup row
