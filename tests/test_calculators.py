"""Clinical calculators as column expressions (kgnorm.calculators).

Mirrors reference clinical_calculators.py: BMI classification,
CHA2DS2-VASc scoring + risk buckets + stroke-rate strings, CKD-EPI 2021
eGFR staging.
"""

import pytest
from pyspark.sql import functions as F

from kgnorm import calculators as calc


def test_bmi(spark):
    df = spark.createDataFrame(
        [(50.0, 170.0), (70.0, 175.0), (85.0, 175.0), (110.0, 170.0), (130.0, 170.0)],
        "w double, h double",
    )
    bmi, risk, interp = calc.bmi_cols(F.col("w"), F.col("h"))
    got = df.select(bmi.alias("bmi"), risk.alias("risk"), interp.alias("i")).collect()
    assert got[0].i == "Underweight"
    assert got[1].i == "Normal weight" and got[1].bmi == pytest.approx(22.9)
    assert got[2].i == "Overweight"
    assert got[3].i == "Class II Obesity"
    assert got[4].i == "Class III Obesity (Morbid)" and got[4].risk == "very_high"


def test_chadsvasc_reference_cases(spark):
    rows = [
        # age, female, chf, htn, dm, stroke, vasc → expected score
        (40, False, False, False, False, False, False, 0),   # nothing
        (66, True, False, False, False, False, False, 2),    # age 65-74 + female
        (80, False, True, True, True, True, True, 8),        # 2+1+1+1+2+1
        (50, False, False, True, False, True, False, 3),     # htn + stroke
    ]
    df = spark.createDataFrame(
        rows, "age int, female boolean, chf boolean, htn boolean, dm boolean,"
              " stroke boolean, vasc boolean, want int")
    s, r, rate = calc.chadsvasc_cols(
        F.col("age"), F.col("female"), F.col("chf"), F.col("htn"),
        F.col("dm"), F.col("stroke"), F.col("vasc"))
    got = df.select("want", s.alias("s"), r.alias("r"), rate.alias("rate")).collect()
    for row in got:
        assert row.s == row.want
    by = {row.want: row for row in got}
    assert by[0].r == "low" and by[0].rate == "0%"
    assert by[2].r == "moderate" and by[2].rate == "2.2%"
    assert by[3].r == "high" and by[3].rate == "4.3%"
    assert by[8].r == "very_high" and by[8].rate == "12%"


def test_egfr_ckdepi_2021(spark):
    df = spark.createDataFrame(
        [(1.0, 50, False), (0.8, 40, True), (3.5, 70, False)],
        "cr double, age int, female boolean")
    e, stage, risk = calc.egfr_ckdepi_cols(F.col("cr"), F.col("age"), F.col("female"))
    got = df.select(e.alias("e"), stage.alias("st"), risk.alias("ri")).collect()

    # python reference (clinical_calculators.py:483-495)
    def ref(cr, age, female):
        kappa = 0.7 if female else 0.9
        alpha = -0.241 if female else -0.302
        r = cr / kappa
        return round(142 * min(r, 1) ** alpha * max(r, 1) ** -1.2 * 0.9938 ** age
                     * (1.012 if female else 1), 1)

    assert got[0].e == pytest.approx(ref(1.0, 50, False))
    assert got[1].e == pytest.approx(ref(0.8, 40, True))
    assert got[2].e == pytest.approx(ref(3.5, 70, False))
    assert got[2].st in ("G4", "G5") and got[2].ri in ("high", "very_high")
    assert got[1].st == "G1"


def test_chadsvasc_from_facts(spark):
    facts = spark.createDataFrame(
        [
            ("C1", "Heart failure", "present"),
            ("C1", "Essential hypertension", "present"),
            ("C1", "Stroke", "absent"),            # negated → no points
            ("C2", "Type 2 diabetes mellitus", "present"),
            ("C2", "Transient ischemic attack", "present"),
        ],
        "conv_id string, concept_name string, assertion string",
    )
    got = {r.conv_id: r for r in calc.chadsvasc_from_facts(facts).collect()}
    assert got["C1"].chadsvasc_score == 2        # chf + htn, stroke negated
    assert got["C2"].chadsvasc_score == 3        # dm(1) + tia(2)
    assert got["C2"].risk_level == "high"
