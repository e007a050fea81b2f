"""Documentation-gap detection (CDI) over extracted mentions.

Port of ``backend/app/services/documentation_gaps.py``:

* 27 specificity rules + 21 laterality conditions extracted verbatim to
  ``data/documentation_gap_rules.json``;
* a specificity gap fires when a rule trigger is a substring of the
  mention AND the "already specific" terms are absent — diabetes terms
  checked in mention OR turn text, hypertension / heart-failure / CKD
  terms in the turn text (:524-543); first matching rule in table order
  wins (:471-490's ``break``);
* a laterality gap (HIGH) fires when a lateralizable condition appears
  without any laterality term in mention or text (:492-523, :545-548);
* rollup: gap counts by severity and the revenue-at-risk estimate —
  critical 500 / high 150 / medium 50 / else 10 (:585-597).

Determinism deviation: the reference's LATERALITY_CONDITIONS is a
Python SET (iteration order unstable) — the fixture stores it sorted
and the first-match uses that order.

Spark-first: rules are a broadcast dimension; the gap check is
(mentions ⋈ turn text on the conversation key) ⋈ broadcast rules with
contains predicates, then a min-rule-order window for the break
semantics; the rollup is one grouped aggregation.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kgnorm.ontology import DATA_DIR

# "already specific" term sets (documentation_gaps.py:524-543), keyed by
# trigger; scope 'both' = mention or text, 'text' = turn text only
SPECIFIC_TERMS: dict[str, tuple[str, list[str]]] = {
    "diabetes": ("both", ["type 1", "type 2", "t1dm", "t2dm", "type i", "type ii"]),
    "dm": ("both", ["type 1", "type 2", "t1dm", "t2dm", "type i", "type ii"]),
    "hypertension": ("text", ["controlled", "uncontrolled", "benign", "malignant"]),
    "heart failure": ("text", ["systolic", "diastolic", "hfref", "hfpef", "preserved", "reduced"]),
    "chf": ("text", ["systolic", "diastolic", "hfref", "hfpef", "preserved", "reduced"]),
    "ckd": ("text", ["stage 1", "stage 2", "stage 3", "stage 4", "stage 5",
                     "esrd", "g1", "g2", "g3", "g4", "g5"]),
    "chronic kidney disease": ("text", ["stage 1", "stage 2", "stage 3", "stage 4", "stage 5",
                                        "esrd", "g1", "g2", "g3", "g4", "g5"]),
}

LATERALITY_TERMS = ["left", "right", "bilateral", "unilateral", "l ", "r ", " l.", " r."]  # :546-547

REVENUE_WEIGHTS = {"critical": 500.0, "high": 150.0, "medium": 50.0}  # :585-597, else 10.0


def load_gap_rules(data_dir: str | None = None) -> tuple[list[dict], list[str]]:
    path = os.path.join(data_dir or DATA_DIR, "documentation_gap_rules.json")
    with open(path) as f:
        d = json.load(f)
    return d["specificity_rules"], d["laterality_conditions"]


def rules_dim(spark: SparkSession, data_dir: str | None = None) -> DataFrame:
    rules, _l = load_gap_rules(data_dir)
    rows = []
    for r in rules:
        scope, terms = SPECIFIC_TERMS.get(r["trigger"], ("text", []))
        rows.append((r["order"], r["trigger"], r["category"], r["severity"],
                     r["issue"], scope, terms,
                     r.get("query"), r.get("impact")))
    return spark.createDataFrame(
        rows, "rule_order int, trigger string, category string, severity string,"
              " issue string, specific_scope string, specific_terms array<string>,"
              " query_text string, impact string"
    )


def laterality_dim(spark: SparkSession, data_dir: str | None = None) -> DataFrame:
    _r, lats = load_gap_rules(data_dir)
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(lats)], "lat_order int, condition string"
    )


def detect_gaps(mentions: DataFrame, transcripts: DataFrame,
                rules: DataFrame, lateralities: DataFrame,
                with_query: bool = False) -> DataFrame:
    """Per-mention documentation gaps.

    ``mentions``: needs (conv_id, turn_idx, mention_text); turn text is
    joined in on the conversation key.  Output: one row per gap
    (conv_id, turn_idx, finding, gap_type, category, severity, issue).
    """
    m = mentions.select(
        "conv_id", "turn_idx", "start_offset",
        F.col("mention_text").alias("finding"),
        F.lower(F.col("mention_text")).alias("ml"),
    ).join(
        transcripts.select("conv_id", "turn_idx", F.lower(F.col("text")).alias("tl")),
        ["conv_id", "turn_idx"],
    )

    # specificity gaps: trigger in mention, specific terms absent;
    # first rule in table order wins (the reference's `break`)
    spec = m.join(F.broadcast(rules), F.col("ml").contains(F.col("trigger")))
    already_specific = F.when(
        F.col("specific_scope") == "both",
        F.exists("specific_terms", lambda t: F.col("ml").contains(t) | F.col("tl").contains(t)),
    ).otherwise(F.exists("specific_terms", lambda t: F.col("tl").contains(t)))
    w_first = Window.partitionBy("conv_id", "turn_idx", "start_offset").orderBy("rule_order")
    spec_gaps = (
        spec.filter(~already_specific)
        .withColumn("_rk", F.row_number().over(w_first))
        .filter(F.col("_rk") == 1)
        .select(
            "conv_id", "turn_idx", "start_offset", "finding",
            F.lit("specificity").alias("gap_type"),
            "category", "severity", "issue",
            *((F.col("query_text"), F.col("impact")) if with_query else ()),
        )
    )

    # laterality gaps: lateralizable condition without any laterality term
    has_lat = None
    for term in LATERALITY_TERMS:
        c = F.col("ml").contains(term) | F.col("tl").contains(term)
        has_lat = c if has_lat is None else (has_lat | c)
    lat = m.join(F.broadcast(lateralities), F.col("ml").contains(F.col("condition")))
    w_lat = Window.partitionBy("conv_id", "turn_idx", "start_offset").orderBy("lat_order")
    lat_gaps = (
        lat.filter(~has_lat)
        .withColumn("_rk", F.row_number().over(w_lat))
        .filter(F.col("_rk") == 1)
        .select(
            "conv_id", "turn_idx", "start_offset", "finding",
            F.lit("laterality").alias("gap_type"),
            F.lit("laterality").alias("category"),
            F.lit("high").alias("severity"),
            F.concat(F.lit("Laterality not specified for "), F.col("condition")).alias("issue"),
            # documentation_gaps.py:500-502
            *((
                F.concat(F.lit("Is this "), F.col("condition"),
                         F.lit(" on the left, right, or bilateral?")).alias("query_text"),
                F.lit("Laterality is REQUIRED for valid ICD-10 coding of this condition")
                .alias("impact"),
            ) if with_query else ()),
        )
    )
    return spec_gaps.unionByName(lat_gaps)


def gap_rollup(gaps: DataFrame) -> DataFrame:
    """Per-conversation CDI rollup (documentation_gaps.py:511-523,
    585-597)."""
    weight = (
        F.when(F.col("severity") == "critical", REVENUE_WEIGHTS["critical"])
        .when(F.col("severity") == "high", REVENUE_WEIGHTS["high"])
        .when(F.col("severity") == "medium", REVENUE_WEIGHTS["medium"])
        .otherwise(10.0)
    )
    return gaps.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("total_gaps"),
        F.sum(F.when(F.col("severity") == "critical", 1).otherwise(0)).alias("n_critical"),
        F.sum(F.when(F.col("severity") == "high", 1).otherwise(0)).alias("n_high"),
        F.sum(F.when(F.col("severity") == "medium", 1).otherwise(0)).alias("n_medium"),
        F.round(F.sum(weight), 2).alias("revenue_at_risk"),
    )
