"""Linking cascade tests (reference: mapping_sql.py tiers; SURVEY §2.4)."""

import pytest
from pyspark.sql import functions as F

from kgnorm import link, schemas


@pytest.fixture(scope="module")
def dims(spark):
    concepts = spark.createDataFrame(
        [
            {"concept_id": 316139, "concept_name": "Congestive heart failure", "concept_code": "42343007",
             "vocabulary_id": "SNOMED", "domain_id": "Condition", "concept_class_id": "Clinical Finding",
             "standard_concept": "S"},
            {"concept_id": 320128, "concept_name": "Essential hypertension", "concept_code": "59621000",
             "vocabulary_id": "SNOMED", "domain_id": "Condition", "concept_class_id": "Clinical Finding",
             "standard_concept": "S"},
            {"concept_id": 1503297, "concept_name": "Metformin", "concept_code": "6809",
             "vocabulary_id": "RxNorm", "domain_id": "Drug", "concept_class_id": "Ingredient",
             "standard_concept": "S"},
            {"concept_id": 77670, "concept_name": "Chest pain", "concept_code": "29857009",
             "vocabulary_id": "SNOMED", "domain_id": "Condition", "concept_class_id": "Clinical Finding",
             "standard_concept": "S"},
            {"concept_id": 4144111, "concept_name": "Pleuritic chest pain", "concept_code": "2237002",
             "vocabulary_id": "SNOMED", "domain_id": "Condition", "concept_class_id": "Clinical Finding",
             "standard_concept": "S"},
        ],
        schema=schemas.CONCEPTS,
    )
    synonyms = spark.createDataFrame(
        [
            {"concept_id": 316139, "concept_synonym_name": "CHF", "language_concept_id": 4180186},
            {"concept_id": 316139, "concept_synonym_name": "heart failure", "language_concept_id": 4180186},
            {"concept_id": 320128, "concept_synonym_name": "hypertension", "language_concept_id": 4180186},
        ],
        schema=schemas.CONCEPT_SYNONYMS,
    )
    return concepts, synonyms


def _map(spark, dims, terms):
    concepts, synonyms = dims
    tdf = spark.createDataFrame([(t,) for t in terms], ["term"])
    rows = link.map_terms(tdf, concepts, synonyms).collect()
    return {t: sorted([r for r in rows if r.term == t], key=lambda r: r.rank) for t in terms}


def test_tier1_exact_name(spark, dims):
    got = _map(spark, dims, ["metformin"])["metformin"]
    assert got[0].concept_id == 1503297
    assert got[0].score == 1.0 and got[0].method == "exact" and got[0].rank == 1


def test_tier2_synonym(spark, dims):
    got = _map(spark, dims, ["heart failure"])["heart failure"]
    assert got[0].concept_id == 316139
    assert got[0].score == 0.95 and got[0].method == "exact"


def test_tier3_prefix_score(spark, dims):
    # "chest pain" prefix-matches "Chest pain" at tier 1 (exact) — use a
    # strict prefix: "essential hyper" → "Essential hypertension"
    got = _map(spark, dims, ["essential hyper"])["essential hyper"]
    assert got[0].concept_id == 320128
    assert got[0].method == "fuzzy"
    assert got[0].score == pytest.approx(min(0.9, len("essential hyper") / len("Essential hypertension") + 0.3))


def test_tier4_jaccard(spark, dims):
    # "severe chest pain": longest word "severe" (6 chars)… not contained;
    # main word must be contained in the name. Use "pleuritic pain chest"
    # → main word "pleuritic" contained in "Pleuritic chest pain",
    # jaccard({pleuritic,pain,chest},{pleuritic,chest,pain}) = 1.0
    got = _map(spark, dims, ["pleuritic pain extra"])["pleuritic pain extra"]
    assert any(r.concept_id == 4144111 for r in got)
    r = [r for r in got if r.concept_id == 4144111][0]
    assert r.method == "fuzzy"
    assert r.score == pytest.approx(2 / 4)  # {pleuritic,pain} ∩ vs union {pleuritic,pain,extra,chest}


def test_rank_dedup_across_tiers(spark, dims):
    # "chest pain" hits tier 1 (exact name) and tier 3 (prefix of itself and
    # of nothing else) — concept 77670 must appear once, rank 1, score 1.0;
    # "Pleuritic chest pain" is NOT a prefix match but tier-4 contains.
    got = _map(spark, dims, ["chest pain"])["chest pain"]
    ids = [r.concept_id for r in got]
    assert ids.count(77670) == 1
    assert got[0].concept_id == 77670 and got[0].score == 1.0


def test_no_match_returns_nothing(spark, dims):
    got = _map(spark, dims, ["zz"])["zz"]
    assert got == []


def test_direct_candidates(spark):
    mentions = spark.createDataFrame(
        [("P1", 0, 5, 8, "HTN", 0, 5, 8, "htn", None, "present", "current", "patient", 0.9, "Condition", 316866)],
        "conv_id string, turn_idx int, a int, b int, mention_text string, start_offset int, s2 int, e2 int,"
        " lexical_variant string, section string, assertion string, temporality string, experiencer string,"
        " confidence double, domain_hint string, omop_concept_id long",
    ).select("conv_id", "turn_idx", F.col("s2").alias("start_offset"), F.col("e2").alias("end_offset"),
             "mention_text", "lexical_variant", "section", "assertion", "temporality", "experiencer",
             "confidence", "domain_hint", "omop_concept_id")
    got = link.direct_candidates(mentions).collect()
    assert len(got) == 1
    r = got[0]
    assert r.omop_concept_id == 316866
    assert r.concept_name == "HTN"  # original mention text (document_processing.py:197)
    assert r.vocabulary_id == "Direct" and r.method == "direct"
    assert r.domain_id == "condition" and r.rank == 1 and r.score == 1.0
