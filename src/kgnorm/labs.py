"""Lab reference ranges + value interpretation.

Port of ``backend/app/services/lab_reference.py``:

* 39-test reference-range table with critical bounds, gender-specific
  overrides, and aliases (:82-586) plus the per-test cause lists
  (:598-640) — extracted verbatim to ``data/lab_reference_ranges.json``;
* lookup: test code first, alias second (:588-592, :677-696);
* interpretation ladder in the reference's exact order — critical_low →
  low → critical_high → high → normal (:735-748) — with
  gender-specific bounds applied first (:717-729);
* ``interpret_panel`` (:833-852) → one row per interpretable value.

Spark-first: the range table explodes (code + aliases) into a lookup
dimension (deduped driver-side with code-beats-alias priority), joined
broadcast against the lab-value stream; the interpretation ladder is a
single CASE chain — whole pipeline is one broadcast join + projection.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from kgnorm.ontology import DATA_DIR


def load_lab_reference(data_dir: str | None = None) -> tuple[list[dict], dict]:
    path = os.path.join(data_dir or DATA_DIR, "lab_reference_ranges.json")
    with open(path) as f:
        d = json.load(f)
    return d["ranges"], d["causes"]


def lookup_rows(data_dir: str | None = None) -> list[tuple]:
    """Deduped lookup rows: key = lower test code or alias; a code entry
    beats an alias claiming the same key (the reference checks
    _test_index before _alias_index).  Shared by the Spark dimension and
    the DuckDB oracle."""
    ranges, _causes = load_lab_reference(data_dir)
    rows: dict[str, tuple] = {}
    # alias entries first, then code entries overwrite (code wins)
    for pri in (1, 0):
        for r in ranges:
            keys = [a.lower() for a in r["aliases"]] if pri == 1 else [r["test_code"].lower()]
            for k in keys:
                rows[k] = (
                    k, r["test_name"], r["test_code"], r["category"], r["unit"],
                    float(r["low_normal"]), float(r["high_normal"]),
                    None if r["low_critical"] is None else float(r["low_critical"]),
                    None if r["high_critical"] is None else float(r["high_critical"]),
                    bool(r["gender_specific"]),
                    None if r["male_low"] is None else float(r["male_low"]),
                    None if r["male_high"] is None else float(r["male_high"]),
                    None if r["female_low"] is None else float(r["female_low"]),
                    None if r["female_high"] is None else float(r["female_high"]),
                )
    return sorted(rows.values())


def reference_dim(spark: SparkSession, data_dir: str | None = None) -> DataFrame:
    return spark.createDataFrame(
        lookup_rows(data_dir),
        "key string, test_name string, test_code string, category string, unit string,"
        " low_normal double, high_normal double, low_critical double, high_critical double,"
        " gender_specific boolean, male_low double, male_high double,"
        " female_low double, female_high double",
    )


def causes_dim(spark: SparkSession, data_dir: str | None = None) -> DataFrame:
    """(test_code, direction) → cause list (lab_reference.py:598-640)."""
    _ranges, causes = load_lab_reference(data_dir)
    rows = [
        (code, direction, lst)
        for code, dirs in causes.items()
        for direction, lst in dirs.items()
    ]
    return spark.createDataFrame(rows, "test_code string, direction string, causes array<string>")


def interpret_labs(labs: DataFrame, ref: DataFrame, gender_col: str | None = None) -> DataFrame:
    """Interpret lab values (lab_reference.py:698-767).

    ``labs``: (conv_id?, ..., name, value) — name matched on
    lower(trim(name)); unmatched names drop (reference returns None).
    Output adds: test_name, test_code, category, unit, level,
    reference_range, is_critical.
    """
    keyed = labs.withColumn("key", F.lower(F.trim(F.col("name"))))
    # avoid name collision with a lab-side 'unit' column
    j = keyed.join(F.broadcast(ref.withColumnRenamed("unit", "ref_unit")), "key")

    if gender_col:
        g = F.lower(F.col(gender_col))
        low = (
            F.when(F.col("gender_specific") & (g == "male") & F.col("male_low").isNotNull(), F.col("male_low"))
            .when(F.col("gender_specific") & (g == "female") & F.col("female_low").isNotNull(), F.col("female_low"))
            .otherwise(F.col("low_normal"))
        )
        high = (
            F.when(F.col("gender_specific") & (g == "male") & F.col("male_low").isNotNull(),
                   F.coalesce(F.col("male_high"), F.col("high_normal")))
            .when(F.col("gender_specific") & (g == "female") & F.col("female_low").isNotNull(),
                  F.coalesce(F.col("female_high"), F.col("high_normal")))
            .otherwise(F.col("high_normal"))
        )
    else:
        low, high = F.col("low_normal"), F.col("high_normal")

    v = F.col("value")
    level = (
        F.when(F.col("low_critical").isNotNull() & (v < F.col("low_critical")), "critical_low")
        .when(v < low, "low")
        .when(F.col("high_critical").isNotNull() & (v > F.col("high_critical")), "critical_high")
        .when(v > high, "high")
        .otherwise("normal")
    )
    return j.select(
        *[c for c in labs.columns],
        "test_name", "test_code", "category", "ref_unit",
        level.alias("level"),
        F.concat(low.cast("string"), F.lit("-"), high.cast("string")).alias("reference_range"),
        level.isin("critical_low", "critical_high").alias("is_critical"),
    )


def with_causes(interpreted: DataFrame, causes: DataFrame) -> DataFrame:
    """Attach the cause list for abnormal values (low/high direction) —
    cause keys are lowercase test codes (lab_reference.py:794-807)."""
    direction = (
        F.when(F.col("level").isin("low", "critical_low"), "low")
        .when(F.col("level").isin("high", "critical_high"), "high")
    )
    d = interpreted.withColumn("direction", direction).withColumn(
        "_code_l", F.lower(F.col("test_code"))
    )
    c = causes.select(F.lower(F.col("test_code")).alias("_code_l"), "direction", "causes")
    return d.join(F.broadcast(c), ["_code_l", "direction"], "left").drop("direction", "_code_l")
