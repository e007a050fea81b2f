"""ICD-10 code suggestion (kgnorm.icd10).

Mirrors reference icd10_suggester.py: exact/partial/description tiers,
confidence levels, first-tier-wins dedup.
"""

import pytest

from kgnorm import icd10


@pytest.fixture(scope="module")
def dims(spark):
    return icd10.codes_dim(spark), icd10.synonyms_dim(spark)


def test_core_table_loaded():
    codes = icd10.load_icd10()
    assert len(codes) == 73
    by_code = {c["code"]: c for c in codes}
    assert "sepsis" in by_code["A41.9"]["synonyms"]


def _suggest(spark, dims, query):
    codes, syns = dims
    qs = spark.createDataFrame([(query,)], ["query"])
    return sorted(icd10.suggest_codes(qs, codes, syns).collect(), key=lambda r: r.rank)


def test_exact_synonym_high(spark, dims):
    got = _suggest(spark, dims, "sepsis")
    assert got[0].code == "A41.9"
    assert got[0].confidence == "high"


def test_alias_exact(spark, dims):
    got = _suggest(spark, dims, "blood poisoning")
    assert got[0].code == "A41.9" and got[0].confidence == "high"


def test_partial_medium(spark, dims):
    got = _suggest(spark, dims, "type 2 diabetes with complications")
    assert any(r.confidence in ("high", "medium") for r in got)
    # exact-or-partial hits rank before description-only hits
    tiers = [r.confidence for r in got]
    assert tiers == sorted(tiers, key=lambda c: {"high": 0, "medium": 1, "low": 2}[c])


def test_description_overlap_low(spark, dims):
    # ≥2 meaningful common words required when the query has >2 words
    # (icd10_suggester.py:885-887): 'chronic'+'kidney' hit N18.x
    got = _suggest(spark, dims, "chronic kidney problems")
    assert got, "expected description-overlap hits"
    assert any(r.confidence == "low" and r.code.startswith("N18") for r in got)

    # a 3-word query with only single-word overlaps yields nothing
    assert _suggest(spark, dims, "acute kidney failure") == []


def test_no_match(spark, dims):
    assert _suggest(spark, dims, "zzz") == []


def test_first_tier_wins_dedup(spark, dims):
    # 'sepsis' matches A41.9 exactly AND partially — one row, high
    got = _suggest(spark, dims, "sepsis")
    codes_seen = [r.code for r in got]
    assert len(codes_seen) == len(set(codes_seen))
