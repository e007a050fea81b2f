"""Clinical value extraction tests (reference: value_extraction.py)."""

import pytest

from kgnorm import normalize, values
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def turns(spark):
    rows = [
        ("C1", 0, "Vitals: BP 142/88, HR 78, temp 98.6F, SpO2 94%. BMI 31.5."),
        ("C1", 1, "Labs: Creatinine 1.8 mg/dL, glucose 145 mg/dl, HbA1c 7.2%. EF 35%."),
        ("C2", 0, "Taking Metformin 1000mg po bid and Aspirin 81mg daily. INR 2.3."),
    ]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")


def test_vitals(spark, turns):
    got = {(r.name): r for r in values.extract_values(turns).filter(F.col("kind") == "vital").collect()}
    assert got["Blood Pressure"].value == 142.0 and got["Blood Pressure"].value2 == 88.0
    assert got["Heart Rate"].value == 78.0
    assert got["Temperature"].value == 98.6
    assert got["Oxygen Saturation"].value == 94.0
    assert got["BMI"].value == 31.5


def test_labs_and_ef(spark, turns):
    rows = values.extract_values(turns).collect()
    labs = {r.name: r for r in rows if r.kind == "lab"}
    assert labs["creatinine"].value == 1.8 and labs["creatinine"].unit == "mg/dl"
    assert labs["glucose"].value == 145.0
    assert labs["HbA1c"].value == 7.2
    assert labs["INR"].value == 2.3
    ef = [r for r in rows if r.name == "Ejection Fraction"]
    assert ef and ef[0].value == 35.0


def test_med_doses(spark, turns):
    meds = {r.name: r for r in values.extract_values(turns).filter(F.col("kind") == "medication").collect()}
    assert meds["metformin"].value == 1000.0 and meds["metformin"].unit == "mg"
    assert meds["metformin"].route == "po" and meds["metformin"].frequency == "bid"
    assert meds["aspirin"].value == 81.0 and meds["aspirin"].frequency == "daily"


def test_normalize_maps(spark):
    df = spark.createDataFrame([("Lipitor",), ("HTN",), ("aspirin",)], ["term"])
    got = {r.term: (r.d, r.c) for r in df.select(
        "term",
        normalize.normalize_drug(F.col("term")).alias("d"),
        normalize.normalize_condition(F.col("term")).alias("c"),
    ).collect()}
    assert got["Lipitor"][0] == "atorvastatin"
    assert got["HTN"][1] == "hypertension"
    assert got["aspirin"] == ("aspirin", "aspirin")  # identity fall-through
