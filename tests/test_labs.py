"""Lab reference ranges + interpretation (kgnorm.labs).

Mirrors reference lab_reference.py:588-767: code-beats-alias lookup,
gender-specific bounds, interpretation ladder order, critical flags,
cause attachment.
"""

import pytest

from kgnorm import labs


@pytest.fixture(scope="module")
def ref(spark):
    return labs.reference_dim(spark)


def test_fixture_loaded():
    ranges, causes = labs.load_lab_reference()
    assert len(ranges) == 39
    assert "k" in causes and "high" in causes["k"]


def test_lookup_code_beats_alias():
    rows = {r[0]: r for r in labs.lookup_rows()}
    # 'k' is the potassium test code (stored case preserved); no alias
    # may shadow it
    assert rows["k"][2].lower() == "k"
    # aliases resolve too
    assert "potassium" in rows


def test_interpretation_ladder(spark, ref):
    vals = spark.createDataFrame(
        [("C1", "potassium", 2.0), ("C2", "potassium", 3.0),
         ("C3", "potassium", 4.0), ("C4", "potassium", 5.8),
         ("C5", "potassium", 7.2), ("C6", "unknown-test", 1.0)],
        "conv_id string, name string, value double",
    )
    got = {r.conv_id: r for r in labs.interpret_labs(vals, ref).collect()}
    assert got["C1"].level == "critical_low" and got["C1"].is_critical
    assert got["C2"].level == "low"
    assert got["C3"].level == "normal"
    assert got["C4"].level == "high"
    assert got["C5"].level == "critical_high" and got["C5"].is_critical
    assert "C6" not in got  # unmatched names drop (reference returns None)


def test_gender_specific_bounds(spark, ref):
    # hemoglobin has gender-specific ranges in the reference table
    vals = spark.createDataFrame(
        [("C1", "hgb", 13.0, "male"), ("C2", "hgb", 13.0, "female")],
        "conv_id string, name string, value double, gender string",
    )
    got = {r.conv_id: r for r in labs.interpret_labs(vals, ref, gender_col="gender").collect()}
    if got["C1"].reference_range != got["C2"].reference_range:
        # male floor is higher → 13.0 may be low for males, normal for females
        assert got["C2"].level == "normal"


def test_causes_attached(spark, ref):
    vals = spark.createDataFrame(
        [("C1", "potassium", 7.2), ("C2", "potassium", 4.0)],
        "conv_id string, name string, value double",
    )
    interp = labs.interpret_labs(vals, ref)
    got = {r.conv_id: r for r in labs.with_causes(interp, labs.causes_dim(spark)).collect()}
    assert got["C1"].causes and "Kidney disease" in got["C1"].causes
    assert got["C2"].causes is None  # normal → no direction → no causes
