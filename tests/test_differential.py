"""Differential diagnosis generation (kgnorm.differential).

Mirrors reference differential_diagnosis.py: 0.9/0.6/0.3 finding
weights, prevalence boost, 2-classic ×1.5 bonus, normalized
probability, emergent cannot-miss flags.
"""

import pytest

from kgnorm import differential as dd


@pytest.fixture(scope="module")
def dims(spark):
    return dd.finding_index_dim(spark), dd.diagnosis_dim(spark)


@pytest.fixture(scope="module")
def aliases():
    _d, a = dd.load_differential()
    return a


def test_fixture_loaded():
    dxs, aliases_ = dd.load_differential()
    assert len(dxs) == 19
    assert len(aliases_) == 90
    assert aliases_["sob"] == "dyspnea"


def test_scoring_matches_reference_formula(spark, dims, aliases):
    index, dxdim = dims
    dxs, _a = dd.load_differential()
    # pick a diagnosis and feed two of its classic findings
    target = next(d for d in dxs if len(d["classic_findings"]) >= 2)
    f1, f2 = target["classic_findings"][:2]
    findings = spark.createDataFrame(
        [("C1", f1), ("C1", f2)], "conv_id string, finding string"
    )
    got = {r.diagnosis: r for r in dd.differential(findings, index, dxdim, aliases).collect()}
    r = got[target["name"]]
    assert r.classic_count == 2
    # (0.9 + 0.9 + prevalence*2) * 1.5 bonus
    want = (0.9 * 2 + target["prevalence_base"] * 2) * 1.5
    assert r.score6 == pytest.approx(round(want, 6))
    maxp = 0.9 * len(target["classic_findings"]) + 0.6 * len(target["common_findings"])
    assert r.probability == pytest.approx(round(min(1.0, want / (maxp + 0.1)), 3))


def test_alias_normalization(spark, dims, aliases):
    index, dxdim = dims
    findings = spark.createDataFrame(
        [("C1", "SOB"), ("C1", "chest pain")], "conv_id string, finding string"
    )
    got = dd.differential(findings, index, dxdim, aliases).collect()
    assert got, "aliased findings must score diagnoses"
    # dyspnea + chest_pain should surface cardiopulmonary diagnoses
    names = {r.diagnosis.lower() for r in got}
    assert any("embolism" in n or "coronary" in n or "failure" in n or "infarction" in n
               for n in names)


def test_cannot_miss_flag(spark, dims, aliases):
    index, dxdim = dims
    findings = spark.createDataFrame(
        [("C1", "chest pain"), ("C1", "dyspnea"), ("C1", "diaphoresis")],
        "conv_id string, finding string",
    )
    got = dd.differential(findings, index, dxdim, aliases).collect()
    emergent = [r for r in got if r.cannot_miss]
    assert emergent and all(r.urgency == "emergent" for r in emergent)


def test_rank_and_cap(spark, dims, aliases):
    index, dxdim = dims
    findings = spark.createDataFrame(
        [("C1", f) for f in ["chest pain", "dyspnea", "fever", "cough", "fatigue", "nausea"]],
        "conv_id string, finding string",
    )
    got = sorted(dd.differential(findings, index, dxdim, aliases).collect(), key=lambda r: r.rank)
    assert len(got) <= 10
    scores = [r.score6 for r in got]
    assert scores == sorted(scores, reverse=True)
