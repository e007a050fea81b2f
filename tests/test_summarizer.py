"""Clinical summarizer — behavior pinned against
backend/app/services/clinical_summarizer.py."""

import pytest
from pyspark.sql import functions as F

FACT_SCHEMA = (
    "conv_id string, concept_name string, domain string, assertion string,"
    " temporality string, experiencer string, confidence double,"
    " first_turn_idx int, first_start_offset int"
)


@pytest.fixture(scope="module")
def facts(spark):
    rows = [
        # conv A: priority ordering + status derivation
        ("A", "Sepsis", "condition", "present", "current", "patient", 0.9, 0, 10),
        ("A", "Essential hypertension", "condition", "present", "current", "patient", 0.8, 0, 30),
        ("A", "Chronic kidney disease", "condition", "present", "current", "patient", 0.8, 1, 5),
        ("A", "Old stroke", "condition", "present", "historical", "patient", 0.7, 2, 5),
        ("A", "Acute distress", "condition", "present", "current", "patient", 0.6, 3, 5),
        ("A", "Fever", "condition", "absent", "current", "patient", 0.9, 4, 5),  # excluded
        ("A", "Metformin", "drug", "present", "current", "patient", 0.9, 0, 50),
        ("A", "Warfarin", "drug", "present", "historical", "patient", 0.9, 1, 50),
        ("A", "Aspirin", "drug", "absent", "current", "patient", 0.9, 2, 50),
        # conv B: no conditions at all
        ("B", "Lisinopril", "drug", "present", "current", "patient", 1.0, 0, 5),
    ]
    return spark.createDataFrame(rows, FACT_SCHEMA)


class TestProblemList:
    def test_status_and_priority(self, spark, facts):
        from kgnorm import summarizer

        probs = {r["name"]: r for r in
                 summarizer.problem_list(facts, spark).filter("conv_id='A'").collect()}
        # absent condition excluded (clinical_summarizer.py:349-350)
        assert "Fever" not in probs
        assert probs["Sepsis"]["priority"] == 100
        assert probs["Sepsis"]["status"] == "active"
        assert probs["Sepsis"]["rank"] == 1
        assert probs["Essential hypertension"]["priority"] == 45
        # 'chronic' in label → chronic; term also matches chronic kidney
        # disease (65)
        assert probs["Chronic kidney disease"]["status"] == "chronic"
        assert probs["Chronic kidney disease"]["priority"] == 65
        # historical → resolved, 'stroke' matches priority 100
        assert probs["Old stroke"]["status"] == "resolved"
        assert probs["Old stroke"]["priority"] == 100
        assert probs["Acute distress"]["status"] == "acute"
        assert probs["Acute distress"]["priority"] == 0

    def test_max_priority_on_multiple_matches(self, spark):
        from kgnorm import summarizer

        f = spark.createDataFrame(
            [("X", "acute kidney injury with sepsis", "condition", "present",
              "current", "patient", 0.9, 0, 0)], FACT_SCHEMA)
        p = summarizer.problem_list(f, spark).collect()[0]
        # matches 'acute kidney injury' (80) and 'sepsis' (100) → max 100
        assert p["priority"] == 100


class TestMedsAndOneLiner:
    def test_medication_status(self, spark, facts):
        from kgnorm import summarizer

        meds = {r["name"]: r["status"] for r in
                summarizer.medication_list(facts).filter("conv_id='A'").collect()}
        assert meds == {"Metformin": "active", "Warfarin": "discontinued",
                        "Aspirin": "discontinued"}

    def test_changes(self, spark, facts):
        from kgnorm import summarizer

        ch = {r["change"] for r in
              summarizer.medication_changes(facts).filter("conv_id='A'").collect()}
        assert ch == {"Discontinued: Warfarin", "Discontinued: Aspirin"}

    def test_one_liner(self, spark, facts):
        from kgnorm import summarizer

        lines = {r["conv_id"]: r["one_liner"] for r in
                 summarizer.one_liner(facts, spark).collect()}
        # top-3 by priority: Sepsis(100), Old stroke(100, later turn),
        # Chronic kidney disease(65); 1 active med
        assert lines["A"] == ("Patient with Sepsis, Old stroke, "
                              "Chronic kidney disease, on 1 medications")
        # no problems → patient-id fallback (clinical_summarizer.py:623-624)
        assert lines["B"] == "Patient B with no significant documented conditions"


class TestCriticalAndRollup:
    def test_critical_findings(self, spark, facts):
        from kgnorm import summarizer

        crit = {r["finding"] for r in
                summarizer.critical_findings(facts).filter("conv_id='A'").collect()}
        # 'sepsis' and 'acute' term hits; absent Fever has no term
        assert crit == {"Critical condition: Sepsis",
                        "Critical condition: Acute distress"}

    def test_critical_limit_5(self, spark):
        from kgnorm import summarizer

        rows = [("X", f"severe problem {i}", "condition", "present", "current",
                 "patient", 0.9, i, 0) for i in range(8)]
        f = spark.createDataFrame(rows, FACT_SCHEMA)
        assert summarizer.critical_findings(f).count() == 5

    def test_critical_labs(self, spark):
        from kgnorm import summarizer

        v = spark.createDataFrame(
            [("A", "Potassium", 7.2, "mEq/L"),
             ("A", "Potassium", 4.0, "mEq/L"),
             ("A", "Sodium", 115.0, "mEq/L"),
             ("A", "Glucose", 99.0, "mg/dL")],
            "conv_id string, label string, value double, unit string")
        out = {r["finding"] for r in summarizer.critical_labs(v).collect()}
        assert out == {"Critical value: Potassium = 7.2",
                       "Critical value: Sodium = 115.0"}

    def test_critical_combined_shared_cap(self, spark):
        """The COMBINED conditions + labs list is capped at 5 with
        conditions first (clinical_summarizer.py:658)."""
        from kgnorm import summarizer

        rows = [("X", f"severe problem {i}", "condition", "present", "current",
                 "patient", 0.9, i, 0) for i in range(4)]
        f = spark.createDataFrame(rows, FACT_SCHEMA)
        v = spark.createDataFrame(
            [("X", "Potassium", 7.2, "mEq/L"),
             ("X", "Sodium", 115.0, "mEq/L"),
             ("X", "Glucose", 600.0, "mg/dL")],
            "conv_id string, label string, value double, unit string")
        out = [r["finding"] for r in
               summarizer.critical_combined(f, v).collect()]
        assert len(out) == 5
        # all 4 conditions survive; only 1 of the 3 critical labs fits
        assert sum(x.startswith("Critical condition:") for x in out) == 4
        assert sum(x.startswith("Critical value:") for x in out) == 1

    def test_critical_combined_cap_above_five(self, spark):
        """cap > 5 must not be silently limited by the condition leg's
        internal cap — conditions fill first up to the full cap."""
        from kgnorm import summarizer

        rows = [("X", f"severe problem {i}", "condition", "present", "current",
                 "patient", 0.9, i, 0) for i in range(8)]
        f = spark.createDataFrame(rows, FACT_SCHEMA)
        v = spark.createDataFrame(
            [("X", "Potassium", 7.2, "mEq/L"),
             ("X", "Sodium", 115.0, "mEq/L"),
             ("X", "Glucose", 600.0, "mg/dL")],
            "conv_id string, label string, value double, unit string")
        out = [r["finding"] for r in
               summarizer.critical_combined(f, v, cap=10).collect()]
        assert len(out) == 10
        assert sum(x.startswith("Critical condition:") for x in out) == 8
        assert sum(x.startswith("Critical value:") for x in out) == 2

    def test_rollup(self, spark, facts):
        from kgnorm import summarizer

        r = {x["conv_id"]: x for x in
             summarizer.problem_summary(facts, spark).collect()}
        a = r["A"]
        assert a["total_problems"] == 5
        assert a["active_problems"] == 3  # active + acute
        assert a["chronic_problems"] == 1
        assert a["resolved_problems"] == 1
        assert a["medication_count"] == 3
        assert a["total_facts"] == 9
        b = r["B"]
        assert b["total_problems"] == 0 and b["medication_count"] == 1
