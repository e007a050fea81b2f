"""CPT/HCPCS code suggestion (kgnorm.cpt)."""

import pytest

from kgnorm import cpt


@pytest.fixture(scope="module")
def dims(spark):
    return cpt.codes_dim(spark), cpt.synonyms_dim(spark)


def test_fixture_loaded():
    codes, synonyms = cpt.load_cpt()
    assert len(codes) == 5046
    assert len(synonyms) == 35350


def _suggest(spark, dims, query):
    codes, syns = dims
    qs = spark.createDataFrame([(query,)], ["query"])
    return sorted(cpt.suggest_codes(qs, codes, syns).collect(), key=lambda r: r.rank)


def test_exact_synonym_is_medium_without_context(spark, dims):
    # confidence quirk (cpt_suggester.py:1121-1126): HIGH needs >2
    # clinical-context evidence items; batch path passes none → MEDIUM
    got = _suggest(spark, dims, "colonoscopy")
    assert got, "expected suggestions"
    assert got[0].confidence == "medium"
    assert got[0].match_type in ("exact_synonym", "partial_synonym")


def test_description_tier_low(spark, dims):
    got = _suggest(spark, dims, "office visit")
    assert got
    assert all(r.confidence in ("medium", "low") for r in got)


def test_rank_capped(spark, dims):
    got = _suggest(spark, dims, "colonoscopy")
    assert len(got) <= 10
    assert [r.rank for r in got] == list(range(1, len(got) + 1))


def test_no_match(spark, dims):
    assert _suggest(spark, dims, "zzz") == []
