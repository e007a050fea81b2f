"""HCC (risk-adjustment) revenue analysis over conversation text.

Port of ``backend/app/services/hcc_analyzer.py``:

* 10 CMS-V28-based HCC definitions — RAF values, ICD-10 code lists,
  clinical-indicator keywords — extracted verbatim to
  ``data/hcc_definitions.json`` (:139-458, PMPM :460);
* ICD-10 → HCC mapping, exact match (:567-580 — the reference's prefix
  branch is a documented no-op, preserved by NOT prefix-matching);
* simplified additive RAF (:582-598);
* opportunity detection: indicator substring present in the note text →
  HCC not already captured → revenue = RAF × PMPM × 12 (:600-672).

Spark-first: the indicator table (85 keywords across 10 HCCs) is a
broadcast dimension; detection is a contains() theta join per turn —
bounded work per row, no shuffle until the per-conversation distinct;
RAF scoring is one grouped sum.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from kgnorm.ontology import DATA_DIR


def load_hcc(data_dir: str | None = None) -> tuple[list[dict], float]:
    path = os.path.join(data_dir or DATA_DIR, "hcc_definitions.json")
    with open(path) as f:
        d = json.load(f)
    return d["definitions"], d["pmpm_payment"]


def hcc_dim(spark: SparkSession, data_dir: str | None = None) -> DataFrame:
    defs, _p = load_hcc(data_dir)
    rows = [
        (d["hcc_code"], d["description"], d["category"],
         float(d["raf_community"]), float(d["raf_institutional"]))
        for d in defs
    ]
    return spark.createDataFrame(
        rows, "hcc_code string, description string, category string,"
              " raf_community double, raf_institutional double"
    )


def icd10_to_hcc_dim(spark: SparkSession, data_dir: str | None = None) -> DataFrame:
    defs, _p = load_hcc(data_dir)
    rows = [(code, d["hcc_code"]) for d in defs for code in d["icd10_codes"]]
    return spark.createDataFrame(rows, "icd10_code string, hcc_code string")


def indicators_dim(spark: SparkSession, data_dir: str | None = None) -> DataFrame:
    defs, _p = load_hcc(data_dir)
    rows = [(d["hcc_code"], ind.lower()) for d in defs for ind in d["clinical_indicators"]]
    return spark.createDataFrame(rows, "hcc_code string, indicator string")


def hccs_from_codes(patient_codes: DataFrame, mapping: DataFrame) -> DataFrame:
    """(conv_id, icd10_code) → distinct (conv_id, hcc_code); exact-match
    join (hcc_analyzer.py:567-580)."""
    return (
        patient_codes.join(F.broadcast(mapping), "icd10_code")
        .select("conv_id", "hcc_code")
        .distinct()
    )


def detect_hccs(transcripts: DataFrame, indicators: DataFrame) -> DataFrame:
    """Clinical-indicator scan: (conv_id, hcc_code, n_indicator_hits)
    per conversation (hcc_analyzer.py:620-632 over all turns)."""
    t = transcripts.select("conv_id", F.lower(F.col("text")).alias("tl"))
    hit = t.join(F.broadcast(indicators), F.col("tl").contains(F.col("indicator")))
    return (
        hit.select("conv_id", "hcc_code", "indicator").distinct()
        .groupBy("conv_id", "hcc_code")
        .agg(F.count(F.lit(1)).alias("n_indicator_hits"))
    )


def raf_scores(patient_hccs: DataFrame, hcc: DataFrame, institutional: bool = False) -> DataFrame:
    """Per-patient additive RAF (hcc_analyzer.py:582-598)."""
    raf_col = "raf_institutional" if institutional else "raf_community"
    return (
        patient_hccs.join(F.broadcast(hcc), "hcc_code")
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_hccs"),
            F.round(F.sum(raf_col), 4).alias("raf_score"),
        )
    )


def hcc_opportunities(
    detected: DataFrame,
    current_hccs: DataFrame | None,
    hcc: DataFrame,
    pmpm: float,
    institutional: bool = False,
) -> DataFrame:
    """Detected-but-uncaptured HCCs with revenue estimate
    (hcc_analyzer.py:636-668): revenue = RAF × PMPM × 12."""
    opp = detected
    if current_hccs is not None:
        opp = detected.join(current_hccs, ["conv_id", "hcc_code"], "left_anti")
    raf_col = "raf_institutional" if institutional else "raf_community"
    return opp.join(F.broadcast(hcc), "hcc_code").select(
        "conv_id", "hcc_code", "description", "category", "n_indicator_hits",
        F.col(raf_col).alias("raf_value"),
        F.round(F.col(raf_col) * pmpm * 12, 2).alias("estimated_revenue"),
    )
