"""Drug-safety contraindication checking (kgnorm.safety).

Mirrors reference drug_safety.py: alias normalization, substring-
either-way condition matching, severity routing, overall-safety ladder
with black-box escalation and unknown-drug caution.
"""

import pytest

from kgnorm import safety


@pytest.fixture(scope="module")
def dims(spark):
    return safety.contraindications_dim(spark), safety.profiles_dim(spark)


@pytest.fixture(scope="module")
def aliases():
    _p, a = safety.load_safety_profiles()
    return a


def test_fixture_loaded():
    profiles, aliases_ = safety.load_safety_profiles()
    assert len(profiles) == 35
    assert sum(len(p["contraindications"]) for p in profiles) == 113


def test_contraindication_substring_match(spark, dims, aliases):
    ci, _p = dims
    meds = spark.createDataFrame([("C1", "metformin")], ["conv_id", "drug"])
    conds = spark.createDataFrame(
        [("C1", "Metabolic acidosis"), ("C1", "Hypertension")], ["conv_id", "condition"]
    )
    got = safety.check_contraindications(meds, conds, ci, aliases).collect()
    assert len(got) == 1
    assert got[0].severity == "contraindicated"
    assert got[0].condition == "metabolic acidosis"


def test_either_way_substring(spark, dims, aliases):
    ci, _p = dims
    meds = spark.createDataFrame([("C1", "ibuprofen")], ["conv_id", "drug"])
    # patient condition is a SUBSTRING of the contraindication text
    conds = spark.createDataFrame([("C1", "heart failure")], ["conv_id", "condition"])
    got = safety.check_contraindications(meds, conds, ci, aliases).collect()
    assert any("heart failure" in r.ci_condition for r in got)


def test_rollup_ladder(spark, dims, aliases):
    ci, profs = dims
    meds = spark.createDataFrame(
        [("C1", "metformin"),        # matched contraindication below
         ("C1", "metoprolol"),       # no match, no black box → safe
         ("C1", "Coumadin"),         # alias → warfarin, black box → warning
         ("C1", "unobtainium")],     # unknown drug → caution
        ["conv_id", "drug"],
    )
    conds = spark.createDataFrame([("C1", "metabolic acidosis")], ["conv_id", "condition"])
    matched = safety.check_contraindications(meds, conds, ci, aliases)
    got = {r.drug: r for r in safety.safety_rollup(matched, meds, profs, aliases).collect()}
    assert got["metformin"].overall_safety in ("contraindicated",)
    assert got["metoprolol"].overall_safety == "safe"
    assert got["warfarin"].overall_safety == "warning"  # black box escalation
    assert got["unobtainium"].overall_safety == "caution"
    assert got["unobtainium"].n_black_box is None
