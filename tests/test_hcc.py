"""HCC risk-adjustment analysis (kgnorm.hcc).

Mirrors reference hcc_analyzer.py: exact ICD-10→HCC mapping, additive
RAF, indicator detection, revenue math (RAF × PMPM × 12).
"""

import pytest

from kgnorm import hcc


@pytest.fixture(scope="module")
def dims(spark):
    return hcc.hcc_dim(spark), hcc.icd10_to_hcc_dim(spark), hcc.indicators_dim(spark)


def test_fixture_loaded():
    defs, pmpm = hcc.load_hcc()
    assert len(defs) == 10
    assert pmpm == 1200.0
    assert sum(len(d["clinical_indicators"]) for d in defs) == 85


def test_icd10_mapping_exact_only(spark, dims):
    _h, mapping, _i = dims
    rows = mapping.collect()
    codes = {r.icd10_code for r in rows}
    some_code = rows[0].icd10_code
    df = spark.createDataFrame(
        [("C1", some_code), ("C1", "ZZZ.99"), ("C2", some_code)],
        "conv_id string, icd10_code string",
    )
    got = hcc.hccs_from_codes(df, mapping).collect()
    assert {(r.conv_id,) for r in got} == {("C1",), ("C2",)}
    assert all(r.hcc_code.startswith("HCC") for r in got)
    assert "ZZZ.99" not in codes  # unmapped code contributes nothing


def test_detect_and_revenue(spark, dims):
    h, _m, inds = dims
    ind_rows = inds.collect()
    kw = ind_rows[0].indicator
    hcc_code = ind_rows[0].hcc_code
    t = spark.createDataFrame(
        [("C1", 0, f"patient has {kw} noted today"), ("C2", 0, "nothing relevant")],
        "conv_id string, turn_idx int, text string",
    )
    detected = hcc.detect_hccs(t, inds)
    got = {r.conv_id: r for r in detected.collect() if r.hcc_code == hcc_code}
    assert "C1" in got and "C2" not in got

    defs, pmpm = hcc.load_hcc()
    opp = {r.conv_id: r for r in hcc.hcc_opportunities(detected, None, h, pmpm).collect()}
    raf = {d["hcc_code"]: d["raf_community"] for d in defs}[hcc_code]
    assert opp["C1"].estimated_revenue == pytest.approx(round(raf * pmpm * 12, 2))


def test_raf_additive(spark, dims):
    h, _m, _i = dims
    defs, _p = hcc.load_hcc()
    two = [d["hcc_code"] for d in defs[:2]]
    df = spark.createDataFrame([("C1", two[0]), ("C1", two[1])], "conv_id string, hcc_code string")
    got = hcc.raf_scores(df, h).collect()[0]
    want = sum(d["raf_community"] for d in defs[:2])
    assert got.n_hccs == 2
    assert got.raf_score == pytest.approx(round(want, 4))


def test_current_hccs_anti_joined(spark, dims):
    h, _m, inds = dims
    ind_rows = inds.collect()
    kw, code = ind_rows[0].indicator, ind_rows[0].hcc_code
    t = spark.createDataFrame([("C1", 0, f"has {kw}")], "conv_id string, turn_idx int, text string")
    detected = hcc.detect_hccs(t, inds)
    current = spark.createDataFrame([("C1", code)], "conv_id string, hcc_code string")
    _defs, pmpm = hcc.load_hcc()
    opp = hcc.hcc_opportunities(detected, current, h, pmpm).collect()
    assert all(not (r.conv_id == "C1" and r.hcc_code == code) for r in opp)
