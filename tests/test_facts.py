"""Fact canonicalization tests (reference: fact_builder*.py; SURVEY §2.5)."""

import math

import pytest
from pyspark.sql import functions as F

from kgnorm import facts as facts_mod


def _fact_inputs(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, start_offset int, end_offset int,"
        " assertion string, temporality string, experiencer string, confidence double,"
        " omop_concept_id long, concept_name string, domain_id string",
    )


def test_noisy_or_merge(spark):
    fi = _fact_inputs(spark, [
        ("C1", 0, 0, 5, "present", "current", "patient", 0.8, 1, "Cough", "condition"),
        ("C1", 1, 0, 5, "present", "current", "patient", 0.6, 1, "Cough", "condition"),
    ])
    got = facts_mod.build_facts(fi).collect()
    assert len(got) == 1
    f = got[0]
    assert f.confidence == pytest.approx(1 - (1 - 0.8) * (1 - 0.6))
    assert f.evidence_count == 2
    assert f.first_turn_idx == 0


def test_dedup_key_splits_on_assertion(spark):
    fi = _fact_inputs(spark, [
        ("C1", 0, 0, 5, "present", "current", "patient", 0.8, 1, "Cough", "condition"),
        ("C1", 1, 0, 5, "absent", "current", "patient", 0.6, 1, "Cough", "condition"),
    ])
    got = facts_mod.build_facts(fi).collect()
    assert len(got) == 2  # absent and present never merge


def test_negation_preserved(spark):
    fi = _fact_inputs(spark, [
        ("C1", 0, 0, 5, "absent", "current", "patient", 0.9, 7, "Pneumonia", "condition"),
    ])
    all_facts = facts_mod.build_facts(fi)
    assert all_facts.count() == 1
    assert facts_mod.positive_facts(all_facts).count() == 0
    assert all_facts.filter(F.col("assertion") == "absent").count() == 1


def test_perfect_confidence_does_not_nan(spark):
    fi = _fact_inputs(spark, [
        ("C1", 0, 0, 5, "present", "current", "patient", 1.0, 1, "Cough", "condition"),
        ("C1", 1, 0, 5, "present", "current", "patient", 0.5, 1, "Cough", "condition"),
    ])
    f = facts_mod.build_facts(fi).collect()[0]
    assert not math.isnan(f.confidence)
    assert f.confidence == pytest.approx(1.0)


def test_first_evidence_wins_name(spark):
    fi = _fact_inputs(spark, [
        ("C1", 2, 0, 5, "present", "current", "patient", 0.5, 1, "LATER", "condition"),
        ("C1", 0, 3, 8, "present", "current", "patient", 0.5, 1, "FIRST", "condition"),
    ])
    f = facts_mod.build_facts(fi).collect()[0]
    assert f.concept_name == "FIRST"
    assert f.first_turn_idx == 0 and f.first_start_offset == 3
