"""Billing compliance joins: CCI bundling edits + medical necessity.

Port of the data-join core of
``backend/app/services/billing_optimizer.py`` (tables in
``data/billing_rules.json``):

* CCI bundling check (:529-570): a claim carrying BOTH a comprehensive
  and its bundled component code raises a HIGH finding with revenue
  impact −25.0;
* medical-necessity check (:572-616): a CPT with a necessity entry and
  NO supporting ICD-10 on the claim raises a HIGH finding — only when
  the claim carries at least one diagnosis (the reference skips
  dx-less claims).

The E/M-level, modifier, and narrative-assessment branches of the
reference are encounter-context heuristics that produce prose — out of
query-engine scope.

Spark-first: both rule tables are broadcast dims; bundling is a
claim-local pair semi-join, necessity an anti-exists over the
(claim, dx) set — one grouped aggregation each, keyed on the claim id.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from kgnorm.ontology import DATA_DIR


def load_billing_rules(data_dir: str | None = None) -> tuple[list[list], dict[str, list[str]]]:
    path = os.path.join(data_dir or DATA_DIR, "billing_rules.json")
    with open(path) as f:
        d = json.load(f)
    return d["cci_bundles"], d["medical_necessity"]


def bundles_dim(spark: SparkSession, data_dir: str | None = None) -> DataFrame:
    bundles, _n = load_billing_rules(data_dir)
    return spark.createDataFrame(
        [tuple(b) for b in bundles],
        "comprehensive string, component string, reason string",
    )


def necessity_dim(spark: SparkSession, data_dir: str | None = None) -> DataFrame:
    """(cpt_code, supporting ICD-10) rows."""
    _b, necessity = load_billing_rules(data_dir)
    rows = [(cpt, dx) for cpt, dxs in necessity.items() for dx in dxs]
    return spark.createDataFrame(rows, "cpt_code string, supporting_dx string")


def check_bundling(claim_cpts: DataFrame, bundles: DataFrame) -> DataFrame:
    """CCI bundling findings (billing_optimizer.py:529-570).

    ``claim_cpts``: (claim_id, cpt_code).  Output one row per violated
    pair: (claim_id, comprehensive, component, reason, severity,
    revenue_impact)."""
    a = claim_cpts.select("claim_id", F.col("cpt_code").alias("comprehensive"))
    b = claim_cpts.select("claim_id", F.col("cpt_code").alias("component"))
    pairs = a.join(b, "claim_id").join(F.broadcast(bundles), ["comprehensive", "component"])
    return pairs.select(
        "claim_id", "comprehensive", "component", "reason",
        F.lit("high").alias("severity"),
        F.lit(-25.0).alias("revenue_impact"),
    )


def check_medical_necessity(
    claim_cpts: DataFrame, claim_dxs: DataFrame, necessity: DataFrame
) -> DataFrame:
    """Medical-necessity findings (billing_optimizer.py:572-616).

    ``claim_dxs``: (claim_id, icd10_code).  A finding fires for a CPT
    with a necessity entry, on a claim that HAS diagnoses, when none of
    them is in the supporting list."""
    supported = (
        claim_cpts.join(F.broadcast(necessity), "cpt_code")
        .join(
            claim_dxs.withColumnRenamed("icd10_code", "supporting_dx"),
            ["claim_id", "supporting_dx"],
            "left_semi",
        )
        .select("claim_id", "cpt_code")
        .distinct()
    )
    has_dx = claim_dxs.select("claim_id").distinct()
    candidates = (
        claim_cpts.join(F.broadcast(necessity.select("cpt_code").distinct()), "cpt_code")
        .join(has_dx, "claim_id", "left_semi")
        .select("claim_id", "cpt_code")
        .distinct()
    )
    return candidates.join(supported, ["claim_id", "cpt_code"], "left_anti").select(
        "claim_id", "cpt_code",
        F.lit("medical_necessity").alias("category"),
        F.lit("high").alias("severity"),
    )
