"""Differential-diagnosis generation over per-patient findings.

Port of ``backend/app/services/differential_diagnosis.py``:

* 19 diagnosis templates + 90 finding aliases extracted verbatim to
  ``data/differential_diagnoses.json`` (:160-693);
* finding index weights — classic 0.9 / common 0.6 / uncommon 0.3
  (:725-744);
* alias normalization, else ``lower().replace(' ', '_')`` (:746-749);
* scoring (:773-820): Σ strengths over matched findings +
  prevalence_base × 2, × 1.5 when ≥ 2 classic findings matched;
* probability = min(1, score / (0.9·n_classic + 0.6·n_common + 0.1)),
  rounded to 3 dp (:838-841);
* emergent-urgency diagnoses flagged cannot-miss (:876-879).

Demographic (age/gender) multipliers (:799-812) are accepted as
optional columns but transcripts carry no demographics, so the KG query
path scores without them — the same documented default the calculators
use.

Spark-first: the finding index (≤ a few hundred rows) is a broadcast
dimension; scoring is one join + grouped aggregation per (patient,
diagnosis); ranking is a per-patient window.  Determinism deviation:
ties rank by diagnosis name (the reference's dict-order sort is
unstable across runs).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kgnorm.ontology import DATA_DIR

_WEIGHTS = [("classic_findings", 0.9), ("common_findings", 0.6), ("uncommon_findings", 0.3)]


def load_differential(data_dir: str | None = None) -> tuple[list[dict], dict[str, str]]:
    path = os.path.join(data_dir or DATA_DIR, "differential_diagnoses.json")
    with open(path) as f:
        d = json.load(f)
    return d["diagnoses"], d["finding_aliases"]


def finding_index_dim(spark: SparkSession, data_dir: str | None = None) -> DataFrame:
    """(finding, diagnosis, strength, is_classic)."""
    dxs, _a = load_differential(data_dir)
    rows = []
    for d in dxs:
        for field, w in _WEIGHTS:
            for finding in d[field]:
                rows.append((finding, d["name"], w, field == "classic_findings"))
    return spark.createDataFrame(
        rows, "finding string, diagnosis string, strength double, is_classic boolean"
    )


def diagnosis_dim(spark: SparkSession, data_dir: str | None = None) -> DataFrame:
    dxs, _a = load_differential(data_dir)
    rows = [
        (d["name"], d["domain"], d["urgency"],
         None if d["omop_concept_id"] is None else int(d["omop_concept_id"]),
         d["icd10_code"], float(d["prevalence_base"]),
         float(0.9 * len(d["classic_findings"]) + 0.6 * len(d["common_findings"])))
        for d in dxs
    ]
    return spark.createDataFrame(
        rows, "diagnosis string, domain string, urgency string,"
              " omop_concept_id bigint, icd10_code string,"
              " prevalence_base double, max_possible double"
    )


def normalize_finding_col(col, aliases: dict[str, str]):
    """Alias hit → canonical key, else lower snake_case (:746-749)."""
    low = F.lower(F.trim(col))
    m = F.create_map(*[F.lit(x) for kv in aliases.items() for x in kv])
    return F.coalesce(F.element_at(m, low), F.regexp_replace(low, " ", "_"))


def differential(
    patient_findings: DataFrame,
    index: DataFrame,
    diagnoses: DataFrame,
    aliases: dict[str, str],
    max_diagnoses: int = 10,
) -> DataFrame:
    """(conv_id, finding) → ranked differential per patient.

    Output: (conv_id, diagnosis, domain, urgency, n_supporting,
    classic_count, score, probability, cannot_miss, rank)."""
    norm = patient_findings.select(
        "conv_id", normalize_finding_col(F.col("finding"), aliases).alias("finding")
    ).distinct()
    matched = norm.join(F.broadcast(index), "finding")
    scored = matched.groupBy("conv_id", "diagnosis").agg(
        F.count(F.lit(1)).alias("n_supporting"),
        F.sum("strength").alias("raw_score"),
        F.sum(F.when(F.col("is_classic"), 1).otherwise(0)).alias("classic_count"),
    )
    with_dx = scored.join(F.broadcast(diagnoses), "diagnosis")
    score = F.col("raw_score") + F.col("prevalence_base") * 2
    score = F.when(F.col("classic_count") >= 2, score * 1.5).otherwise(score)
    with_score = with_dx.withColumn("score", score).withColumn(
        "probability",
        F.round(F.least(F.lit(1.0), F.col("score") / (F.col("max_possible") + 0.1)), 3),
    )
    w = Window.partitionBy("conv_id").orderBy(F.desc("score"), "diagnosis")
    return (
        with_score.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= max_diagnoses)
        .select(
            "conv_id", "diagnosis", "domain", "urgency",
            "n_supporting", "classic_count",
            F.round("score", 6).alias("score6"), "probability",
            (F.col("urgency") == "emergent").alias("cannot_miss"),
            "rank",
        )
    )
