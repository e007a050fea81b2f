"""CDI coding-query generator — behavior pinned against
backend/app/services/coding_query_generator.py."""

import pytest
from pyspark.sql import functions as F

GAP_SCHEMA = (
    "conv_id string, turn_idx int, start_offset int, finding string,"
    " gap_type string, category string, severity string, issue string,"
    " query_text string, impact string"
)


def _gaps(spark, rows):
    return spark.createDataFrame(rows, GAP_SCHEMA)


def _gen(spark, rows, encounter_type=""):
    from kgnorm import cdi

    return cdi.generate_queries(
        _gaps(spark, rows), cdi.templates_dim(spark), encounter_type
    ).collect()


class TestTemplateMatching:
    def test_diabetes_type(self, spark):
        r = _gen(spark, [("A", 0, 0, "diabetes", "specificity", "type", "high",
                          "Diabetes type not specified", "q?", "imp")])[0]
        assert r["template_key"] == "diabetes_type"
        # template question overrides the gap's own query text (:548-551)
        assert r["question"] == "Please specify the type of diabetes mellitus:"
        assert r["coding_impacts"] == "HCC,QUALITY"
        assert r["n_options"] == 4

    def test_dm_substring_quirk(self, spark):
        # 'admission' contains 'dm' → the diabetes branch fires (:502)
        r = _gen(spark, [("A", 0, 0, "admission", "specificity", "x", "high",
                          "type unclear", "q?", "imp")])[0]
        assert r["template_key"] == "diabetes_type"

    def test_fallthrough_on_inner_miss(self, spark):
        # finding hits the diabetes branch but the issue matches none of
        # its inner checks → control falls through to the stroke branch
        # (reference if-chain returns only on inner hits, :500-535)
        r = _gen(spark, [("A", 0, 0, "diabetic stroke", "specificity",
                          "x", "high", "organism unknown", "q?", "imp")])[0]
        assert r["template_key"] == "stroke_type"

    def test_laterality_category(self, spark):
        r = _gen(spark, [("A", 0, 0, "hip fracture of knee", "laterality",
                          "laterality", "high",
                          "Laterality not specified for fracture",
                          "Is this fracture on the left, right, or bilateral?",
                          "imp")])[0]
        # 'fracture' outer hits but issue lacks episode/initial → falls
        # through to the laterality category branch
        assert r["template_key"] == "laterality"

    def test_no_template_uses_gap_query(self, spark):
        r = _gen(spark, [("A", 0, 0, "mystery finding", "specificity",
                          "x", "medium", "odd issue", "own question?", "imp")])[0]
        assert r["template_key"] is None
        assert r["question"] == "own question?"
        assert r["regulatory_basis"] == "ICD-10-CM Official Guidelines"
        # SPECIFICITY always inferred (:643)
        assert r["coding_impacts"] == "SPECIFICITY"

    def test_inferred_impacts_order(self, spark):
        r = _gen(spark, [("A", 0, 0, "acute copd exacerbation screening",
                          "specificity", "x", "medium", "odd", "q?", "imp")])[0]
        # HCC (copd) → CC_MCC (acute/exacerbation) → SPECIFICITY → QUALITY
        # (screening), in reference append order (:623-647)
        assert r["coding_impacts"] == "HCC,CC_MCC,SPECIFICITY,QUALITY"


class TestPriorityAndRanking:
    def test_priority_default_encounter(self, spark):
        rows = [("A", 0, i, f"f{i}", "specificity", "x", sev, "odd", "q?", "imp")
                for i, sev in enumerate(["critical", "high", "medium", "low"])]
        out = {r["severity"]: r for r in _gen(spark, rows)}
        assert out["critical"]["priority"] == "urgent"
        assert out["high"]["priority"] == "routine"
        assert out["medium"]["priority"] == "routine"
        assert out["low"]["priority"] == "deferred"
        assert out["critical"]["estimated_revenue_impact"] == 500.0
        assert out["low"]["estimated_revenue_impact"] == 10.0
        assert out["critical"]["cer_strength"] == "HIGH"
        assert out["medium"]["cer_strength"] == "MEDIUM"

    def test_priority_inpatient(self, spark):
        rows = [("A", 0, 0, "f", "specificity", "x", "critical", "odd", "q?", "i"),
                ("A", 0, 1, "g", "specificity", "x", "high", "odd", "q?", "i")]
        out = {r["severity"]: r for r in _gen(spark, rows, "inpatient admission")}
        # critical → STAT and high → URGENT for inpatient (:606-615)
        assert out["critical"]["priority"] == "stat"
        assert out["high"]["priority"] == "urgent"

    def test_rank_by_priority_then_impact(self, spark):
        rows = [("A", 0, 0, "low one", "specificity", "x", "low", "odd", "q?", "i"),
                ("A", 0, 1, "crit one", "specificity", "x", "critical", "odd", "q?", "i"),
                ("A", 0, 2, "med one", "specificity", "x", "medium", "odd", "q?", "i")]
        out = sorted(_gen(spark, rows), key=lambda r: r["query_rank"])
        assert [r["finding"] for r in out] == ["crit one", "med one", "low one"]

    def test_query_id_deterministic(self, spark):
        a = _gen(spark, [("A", 0, 0, "f", "specificity", "x", "high", "o", "q?", "i")])
        b = _gen(spark, [("A", 0, 0, "f", "specificity", "x", "high", "o", "q?", "i")])
        assert a[0]["query_id"] == b[0]["query_id"]
        assert len(a[0]["query_id"]) == 16


class TestBatch:
    def test_rollup(self, spark):
        from kgnorm import cdi

        rows = [
            ("A", 0, 0, "heart failure", "specificity", "type", "high",
             "Heart failure type not specified", "q?", "i"),
            ("A", 0, 1, "mystery", "specificity", "x", "low", "odd", "q?", "i"),
            ("B", 0, 0, "ckd", "specificity", "stage", "critical",
             "CKD stage missing", "q?", "i"),
        ]
        gaps = _gaps(spark, rows)
        qrs = cdi.generate_queries(gaps, cdi.templates_dim(spark))
        out = {r["conv_id"]: r for r in cdi.query_batch(qrs, gaps).collect()}
        a = out["A"]
        assert a["total_queries"] == 2
        assert a["n_routine"] == 1 and a["n_deferred"] == 1
        # heart_failure_type template carries DRG_CHANGE + HCC impacts
        assert a["drg_impact_possible"] == 1 and a["hcc_impact_possible"] == 1
        assert a["revenue_at_risk"] == 160.0  # 150 high + 10 low
        b = out["B"]
        assert b["n_urgent"] == 1 and b["revenue_at_risk"] == 500.0
