"""ETL code-mapping joins (kgnorm.codemap).

Mirrors reference vocabulary_mapping.py: local override first, source
lookup, Maps-to preference, relationship-typed confidence, unmapped
reasons, batch mapping rate.
"""

import pytest

from kgnorm import codemap


@pytest.fixture(scope="module")
def dims(spark):
    concepts = spark.createDataFrame(
        [
            (100, "Pneumonia", "J18.9", "ICD10CM"),
            (200, "Pneumonia (SNOMED)", "233604007", "SNOMED"),
            (300, "Metformin NDC", "0093-1048", "NDC"),
            (400, "Metformin", "6809", "RxNorm"),
            (500, "Orphan code", "Z99", "ICD10CM"),
        ],
        "concept_id long, concept_name string, concept_code string, vocabulary_id string",
    )
    rels = spark.createDataFrame(
        [
            (100, 200, "Maps to"),
            (100, 999, "Is a"),          # Maps to must win over Is a
            (300, 400, "Maps to"),
            (500, 501, "Is a"),          # no Maps to → Is a, medium/0.75
        ],
        "concept_id_1 long, concept_id_2 long, relationship_id string",
    )
    return concepts, rels


def test_direct_mapping_prefers_maps_to(spark, dims):
    concepts, rels = dims
    codes = spark.createDataFrame([("j18.9", "ICD10CM")], ["source_code", "source_vocabulary"])
    r = codemap.map_codes(codes, concepts, rels).collect()[0]
    assert r.source_concept_id == 100
    assert r.target_concept_id == 200
    assert r.relationship_id == "Maps to"
    assert (r.mapping_type, r.confidence, r.confidence_score) == ("direct", "high", 0.95)
    assert r.target_vocabulary == "SNOMED"  # ICD10CM → SNOMED path


def test_hierarchy_fallback_confidence(spark, dims):
    concepts, rels = dims
    codes = spark.createDataFrame([("Z99", "ICD10CM")], ["source_code", "source_vocabulary"])
    r = codemap.map_codes(codes, concepts, rels).collect()[0]
    assert r.relationship_id == "Is a"
    assert (r.confidence, r.confidence_score) == ("medium", 0.75)


def test_unmapped_reasons(spark, dims):
    concepts, rels = dims
    codes = spark.createDataFrame(
        [("NOPE", "ICD10CM"), ("6809", "RxNorm")], ["source_code", "source_vocabulary"]
    )
    got = {r.source_code: r for r in codemap.map_codes(codes, concepts, rels).collect()}
    assert got["NOPE"].mapping_type == "unmapped"
    assert "not found" in got["NOPE"].unmapped_reason
    # source exists (RxNorm Metformin) but has no relationship
    assert got["6809"].mapping_type == "unmapped"
    assert got["6809"].unmapped_reason == "No 'Maps to' relationship found"
    assert got["6809"].source_concept_id == 400


def test_local_mapping_wins(spark, dims):
    concepts, rels = dims
    codes = spark.createDataFrame([("j18.9", "ICD10CM")], ["source_code", "source_vocabulary"])
    locals_df = spark.createDataFrame(
        [("J18.9", "ICD10CM", "Local pneumonia", 777, "Pneumonia local")],
        "local_code string, local_vocabulary string, local_description string,"
        " omop_concept_id long, omop_concept_name string",
    )
    r = codemap.map_codes(codes, concepts, rels, locals_df).collect()[0]
    assert (r.mapping_type, r.target_concept_id, r.confidence_score) == ("local", 777, 0.7)


def test_mapping_rate(spark, dims):
    concepts, rels = dims
    codes = spark.createDataFrame(
        [("J18.9", "ICD10CM"), ("NOPE", "ICD10CM")], ["source_code", "source_vocabulary"]
    )
    rate = codemap.mapping_rate(codemap.map_codes(codes, concepts, rels)).collect()[0]
    assert (rate.total_codes, rate.mapped) == (2, 1)
    assert rate.mapping_rate == pytest.approx(0.5)
