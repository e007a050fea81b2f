"""Documentation-gap detection (kgnorm.docgaps)."""

import pytest

from kgnorm import docgaps


@pytest.fixture(scope="module")
def dims(spark):
    return docgaps.rules_dim(spark), docgaps.laterality_dim(spark)


def _run(spark, dims, mention_rows, text_rows):
    rules, lats = dims
    m = spark.createDataFrame(
        mention_rows, "conv_id string, turn_idx int, start_offset int, mention_text string")
    t = spark.createDataFrame(text_rows, "conv_id string, turn_idx int, text string")
    return docgaps.detect_gaps(m, t, rules, lats).collect()


def test_fixture_loaded():
    rules, lats = docgaps.load_gap_rules()
    assert len(rules) == 27
    assert len(lats) == 21


def test_unspecified_diabetes_gap(spark, dims):
    got = _run(spark, dims,
               [("C1", 0, 10, "diabetes")],
               [("C1", 0, "Patient has diabetes, follow up soon")])
    assert any(g.gap_type == "specificity" and "diabetes" in g.finding for g in got)


def test_specific_diabetes_no_gap(spark, dims):
    got = _run(spark, dims,
               [("C1", 0, 10, "diabetes")],
               [("C1", 0, "Patient has type 2 diabetes on metformin")])
    assert not any(g.gap_type == "specificity" for g in got)


def test_heart_failure_text_specificity(spark, dims):
    got = _run(spark, dims,
               [("C1", 0, 0, "heart failure")],
               [("C1", 0, "heart failure with reduced ejection fraction")])
    assert not any(g.gap_type == "specificity" and "heart failure" in g.finding.lower()
                   for g in got)


def test_laterality_gap_and_satisfied(spark, dims):
    # note the reference quirk (:546-547): terms 'l ' / 'r ' match ANY
    # word ending in l/r before a space, silently satisfying laterality —
    # the text below avoids such words so the gap can fire
    got = _run(spark, dims,
               [("C1", 0, 0, "cataract")],
               [("C1", 0, "patient has cataract noted today")])
    assert any(g.gap_type == "laterality" for g in got)
    got2 = _run(spark, dims,
                [("C1", 0, 0, "cataract")],
                [("C1", 0, "patient has left cataract noted today")])
    assert not any(g.gap_type == "laterality" for g in got2)

    # quirk demonstration: a stray word ending in 'l ' suppresses the gap
    got3 = _run(spark, dims,
                [("C1", 0, 0, "cataract")],
                [("C1", 0, "patient has cataract, will follow up")])
    assert not any(g.gap_type == "laterality" for g in got3)


def test_rollup_revenue_weights(spark, dims):
    rules, lats = dims
    gaps = spark.createDataFrame(
        [("C1", 0, 0, "x", "specificity", "c", "critical", "i"),
         ("C1", 0, 1, "y", "specificity", "c", "high", "i"),
         ("C1", 0, 2, "z", "laterality", "laterality", "medium", "i")],
        "conv_id string, turn_idx int, start_offset int, finding string,"
        " gap_type string, category string, severity string, issue string")
    r = docgaps.gap_rollup(gaps).collect()[0]
    assert r.total_gaps == 3
    assert r.revenue_at_risk == pytest.approx(500.0 + 150.0 + 50.0)
