"""Drug-safety checking: contraindications against patient conditions.

Port of ``backend/app/services/drug_safety.py``:

* 35 merged safety profiles / 113 contraindications extracted verbatim
  to ``data/drug_safety_profiles.json`` (provenance in the file header);
* alias normalization (:746-750);
* condition matching: substring EITHER way between the patient
  condition and the contraindication condition (:809-819);
* severity routing (contraindicated / warning / caution) and the
  overall-safety ladder — black-box warnings always count as warnings
  (:803-804, :860-867).

Spark-first: profiles and contraindications are broadcast dimensions;
the check is (patient drugs ⋈ patient conditions) per conversation —
both sides come from the facts table, so the join key is the natural
conversation partitioning — against the broadcast contraindication dim
with a contains() predicate; the rollup is one grouped aggregation.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from kgnorm.ontology import DATA_DIR


def load_safety_profiles(data_dir: str | None = None) -> tuple[list[dict], dict[str, str]]:
    path = os.path.join(data_dir or DATA_DIR, "drug_safety_profiles.json")
    with open(path) as f:
        d = json.load(f)
    return d["profiles"], d["aliases"]


def contraindications_dim(spark: SparkSession, data_dir: str | None = None) -> DataFrame:
    """(generic drug, contraindicated condition, severity, rationale)."""
    profiles, _a = load_safety_profiles(data_dir)
    rows = [
        (p["generic_name"].lower(), c["condition"].lower(), c["severity"], c["rationale"])
        for p in profiles
        for c in p["contraindications"]
    ]
    return spark.createDataFrame(
        rows, "drug string, ci_condition string, severity string, rationale string"
    )


def profiles_dim(spark: SparkSession, data_dir: str | None = None) -> DataFrame:
    """Per-drug profile summary (black-box count, pregnancy/lactation)."""
    profiles, _a = load_safety_profiles(data_dir)
    rows = [
        (p["generic_name"].lower(), len(p["black_box_warnings"]),
         p["pregnancy_category"], p["lactation_safety"])
        for p in profiles
    ]
    return spark.createDataFrame(
        rows, "drug string, n_black_box int, pregnancy_category string, lactation_safety string"
    )


def _normalize(col, aliases: dict[str, str]):
    low = F.lower(F.trim(col))
    if not aliases:
        return low
    m = F.create_map(*[F.lit(x) for kv in aliases.items() for x in kv])
    return F.coalesce(F.element_at(m, low), low)


def check_contraindications(
    patient_drugs: DataFrame,
    patient_conditions: DataFrame,
    ci: DataFrame,
    aliases: dict[str, str] | None = None,
) -> DataFrame:
    """Matched contraindications per (conversation, drug, condition).

    ``patient_drugs``: (conv_id, drug); ``patient_conditions``:
    (conv_id, condition).  Match = contraindication condition is a
    substring of the patient condition or vice versa
    (drug_safety.py:813-815)."""
    meds = patient_drugs.select(
        "conv_id", _normalize(F.col("drug"), aliases or {}).alias("drug")
    ).distinct()
    conds = patient_conditions.select(
        "conv_id", F.lower(F.trim(F.col("condition"))).alias("condition")
    ).distinct()
    paired = meds.join(conds, "conv_id")
    matched = paired.join(
        F.broadcast(ci),
        (paired.drug == ci.drug)
        & (F.col("condition").contains(F.col("ci_condition"))
           | F.col("ci_condition").contains(F.col("condition"))),
    )
    return matched.select(
        "conv_id", paired.drug.alias("drug"), "condition",
        "ci_condition", "severity", "rationale",
    )


def safety_rollup(
    matched: DataFrame,
    patient_drugs: DataFrame,
    profiles: DataFrame,
    aliases: dict[str, str] | None = None,
) -> DataFrame:
    """Per-(conversation, drug) overall safety
    (drug_safety.py:803-804, 860-867): contraindicated > warning >
    caution > safe; black-box warnings always raise to ≥ warning; drugs
    absent from the profile table report 'caution' with n_black_box
    NULL (reference returns CAUTION + 'not found' warning)."""
    meds = patient_drugs.select(
        "conv_id", _normalize(F.col("drug"), aliases or {}).alias("drug")
    ).distinct()
    counts = matched.groupBy("conv_id", "drug").agg(
        F.sum(F.when(F.col("severity") == "contraindicated", 1).otherwise(0)).alias("n_ci"),
        F.sum(F.when(F.col("severity") == "warning", 1).otherwise(0)).alias("n_warn"),
        F.sum(F.when(F.col("severity") == "caution", 1).otherwise(0)).alias("n_caution"),
    )
    base = (
        meds.join(F.broadcast(profiles), "drug", "left")
        .join(counts, ["conv_id", "drug"], "left")
        .na.fill({"n_ci": 0, "n_warn": 0, "n_caution": 0})
    )
    overall = (
        F.when(F.col("n_black_box").isNull(), "caution")  # unknown drug
        .when(F.col("n_ci") > 0, "contraindicated")
        .when((F.col("n_warn") > 0) | (F.col("n_black_box") > 0), "warning")
        .when(F.col("n_caution") > 0, "caution")
        .otherwise("safe")
    )
    return base.select(
        "conv_id", "drug", "n_ci", "n_warn", "n_caution",
        "n_black_box", overall.alias("overall_safety"),
    )
