"""Billing compliance joins (kgnorm.billing)."""

import pytest

from kgnorm import billing


@pytest.fixture(scope="module")
def dims(spark):
    return billing.bundles_dim(spark), billing.necessity_dim(spark)


def test_fixture_loaded():
    bundles, necessity = billing.load_billing_rules()
    assert len(bundles) == 7
    assert len(necessity) == 6


def test_bundling_pair_detected(spark, dims):
    bundles, _n = dims
    cpts = spark.createDataFrame(
        [("E1", "99215"), ("E1", "99213"), ("E1", "80053")], ["claim_id", "cpt_code"]
    )
    got = billing.check_bundling(cpts, bundles).collect()
    assert len(got) == 1
    assert (got[0].comprehensive, got[0].component) == ("99215", "99213")
    assert got[0].revenue_impact == -25.0


def test_bundling_direction_matters(spark, dims):
    bundles, _n = dims
    # component alone, no comprehensive → no finding
    cpts = spark.createDataFrame([("E1", "99213")], ["claim_id", "cpt_code"])
    assert billing.check_bundling(cpts, bundles).count() == 0


def test_necessity_gap_and_support(spark, dims):
    _b, nec = dims
    cpts = spark.createDataFrame(
        [("E1", "83036"), ("E2", "83036")], ["claim_id", "cpt_code"]
    )
    dxs = spark.createDataFrame(
        [("E1", "K21.9"),       # unrelated dx → gap
         ("E2", "E11.9")],      # supports 83036 → no gap
        ["claim_id", "icd10_code"],
    )
    got = billing.check_medical_necessity(cpts, dxs, nec).collect()
    assert [(r.claim_id, r.cpt_code) for r in got] == [("E1", "83036")]


def test_necessity_skips_dxless_claims(spark, dims):
    _b, nec = dims
    cpts = spark.createDataFrame([("E1", "83036")], ["claim_id", "cpt_code"])
    dxs = spark.createDataFrame([], "claim_id string, icd10_code string")
    # reference fires only when codes.icd10_codes is non-empty (:582)
    assert billing.check_medical_necessity(cpts, dxs, nec).count() == 0
