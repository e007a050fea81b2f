"""Drug-drug interaction checking over per-patient medication lists.

Port of ``backend/app/services/drug_interactions.py``:

* curated interaction table + expanded fixture, merged core-first with
  duplicate pairs skipped (:527-603) — extracted verbatim to
  ``data/drug_interactions.json`` (provenance in the file header);
* alias normalization (:418-480, :628-638);
* pairwise check over the distinct normalized med list (:664-686);
* severity rollup: counts by severity, highest severity,
  contraindicated/major flags (:688-723).

Spark-first: the interaction table is a broadcast dimension keyed on
the SORTED pair (least, greatest); per-patient pair generation is a
conversation-local self-join (equi join on conv_id, so pairs never
cross partitions); the rollup is one grouped aggregation.  At 10⁹
patients × ~10 meds the self-join emits ~45 pairs per patient — linear
in patients, no global shuffle beyond the conv key.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from kgnorm.ontology import DATA_DIR

# severity order for 'highest' (drug_interactions.py:706-719)
_SEVERITY_RANK = {"contraindicated": 0, "major": 1, "moderate": 2, "minor": 3}


def load_interaction_data(data_dir: str | None = None) -> tuple[list[dict], dict[str, str]]:
    path = os.path.join(data_dir or DATA_DIR, "drug_interactions.json")
    with open(path) as f:
        d = json.load(f)
    return d["interactions"], d["aliases"]


def interactions_dim(spark: SparkSession, data_dir: str | None = None) -> DataFrame:
    """Broadcastable interaction dimension keyed on the sorted pair."""
    rows, _aliases = load_interaction_data(data_dir)
    recs = [
        (min(r["drug1"], r["drug2"]), max(r["drug1"], r["drug2"]),
         r["severity"], r["interaction_type"], r["clinical_effect"], r["management"])
        for r in rows
    ]
    return spark.createDataFrame(
        recs,
        "pair_lo string, pair_hi string, severity string, interaction_type string,"
        " clinical_effect string, management string",
    )


def normalize_drug_col(col, aliases: dict[str, str]):
    """lower + alias resolution (drug_interactions.py:628-638)."""
    low = F.lower(F.trim(col))
    if not aliases:
        return low
    m = F.create_map(*[F.lit(x) for kv in aliases.items() for x in kv])
    return F.coalesce(F.element_at(m, low), low)


def check_interactions(
    patient_drugs: DataFrame,
    interactions: DataFrame,
    aliases: dict[str, str] | None = None,
) -> DataFrame:
    """Per-patient interacting pairs.

    ``patient_drugs``: (conv_id, drug).  Output: one row per found
    interaction (conv_id, drug1, drug2, severity, interaction_type,
    clinical_effect, management) with drug1 < drug2.
    """
    norm = patient_drugs.select(
        "conv_id", normalize_drug_col(F.col("drug"), aliases or {}).alias("d")
    ).distinct()
    a = norm.alias("a")
    b = norm.alias("b")
    pairs = (
        a.join(b, "conv_id")
        .filter(F.col("a.d") < F.col("b.d"))
        .select("conv_id", F.col("a.d").alias("pair_lo"), F.col("b.d").alias("pair_hi"))
    )
    return pairs.join(F.broadcast(interactions), ["pair_lo", "pair_hi"]).select(
        "conv_id",
        F.col("pair_lo").alias("drug1"),
        F.col("pair_hi").alias("drug2"),
        "severity", "interaction_type", "clinical_effect", "management",
    )


def interaction_summary(found: DataFrame) -> DataFrame:
    """Per-patient rollup (drug_interactions.py:688-723)."""
    rank = F.create_map(*[F.lit(x) for kv in _SEVERITY_RANK.items() for x in kv])
    inv = {v: k for k, v in _SEVERITY_RANK.items()}
    highest = F.create_map(*[F.lit(x) for kv in inv.items() for x in kv])[F.min(rank[F.col("severity")])]
    return found.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("total_interactions"),
        F.sum(F.when(F.col("severity") == "contraindicated", 1).otherwise(0)).alias("n_contraindicated"),
        F.sum(F.when(F.col("severity") == "major", 1).otherwise(0)).alias("n_major"),
        F.sum(F.when(F.col("severity") == "moderate", 1).otherwise(0)).alias("n_moderate"),
        F.sum(F.when(F.col("severity") == "minor", 1).otherwise(0)).alias("n_minor"),
        highest.alias("highest_severity"),
        F.max(F.col("severity") == "contraindicated").alias("has_contraindicated"),
        F.max(F.col("severity") == "major").alias("has_major"),
    )
