"""CDI coding-query generation: documentation gaps → structured,
prioritized provider-clarification queries.

Port of ``backend/app/services/coding_query_generator.py``:

* template matching on finding/issue substrings (:496-535) — including
  the reference's bare-substring quirks (``"dm" in finding`` also
  matches 'admission', ``"hf"`` matches any word containing it);
* priority from severity × encounter type (:599-621);
* inferred coding impacts for template-less gaps (:623-647), appended
  in HCC → CC_MCC → SPECIFICITY → QUALITY order;
* CER strength from severity (:681-689), revenue impact per severity
  (:727-736);
* prioritized ordering (priority rank, then impact desc, :737-753);
* per-encounter batch rollup (:755-803).

Template data (questions, response options, impacts, regulatory basis)
lives verbatim in ``data/cdi_query_templates.json`` (coding_query_
generator.py:162-361).

Spark-first: template resolution is a CASE cascade compiled from the
reference's if-chain; template attributes come from a 12-row broadcast
dim; prioritization is a rank window per conversation.  Deterministic
deviation: the reference's ``query_id`` embeds ``datetime.now()`` +
``uuid4`` (:543) — unreproducible across retried tasks — so here it is
a sha2 digest of (conv_id, turn_idx, start_offset, finding, category).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "data")

# :623-641
HCC_CONDITIONS = ["diabetes", "chf", "heart failure", "ckd", "copd", "stroke", "cancer"]
CC_CONDITIONS = ["acute", "exacerbation", "complication", "failure", "sepsis"]
QUALITY_CONDITIONS = ["diabetes", "hypertension", "depression", "screening"]

# :727-736
REVENUE_IMPACT = {"critical": 500.0, "high": 150.0, "medium": 50.0, "low": 10.0}
DEFAULT_REVENUE_IMPACT = 25.0

# :681-689
CER_STRENGTH = {"critical": "HIGH", "high": "HIGH", "medium": "MEDIUM", "low": "LOW"}

# :737-744
PRIORITY_ORDER = {"stat": 0, "urgent": 1, "routine": 2, "deferred": 3}


def load_templates(data_dir: str | None = None) -> dict:
    with open(os.path.join(data_dir or DATA_DIR, "cdi_query_templates.json")) as f:
        return json.load(f)["templates"]


def templates_dim(spark: SparkSession, data_dir: str | None = None) -> DataFrame:
    rows = []
    for key, t in load_templates(data_dir).items():
        rows.append((
            key,
            t["question"],
            len(t.get("response_options", [])),
            ",".join(t.get("coding_impacts", [])),
            "; ".join(t.get("regulatory_basis", [])),
        ))
    return spark.createDataFrame(
        rows, "template_key string, question string, n_options int,"
              " coding_impacts string, regulatory_basis string"
    )


def _contains_any(col, terms):
    out = None
    for t in terms:
        c = col.contains(t)
        out = c if out is None else (out | c)
    return out


def template_key_col(finding, issue, category):
    """The reference's if-chain (:496-535) as a COALESCE of guarded
    branches: each outer ``if`` only *returns* when its inner issue check
    also hits, otherwise control FALLS THROUGH to the next condition —
    a plain CASE chain would stop at the first outer match, so each
    branch is NULL-on-inner-miss and coalesce restores the fallthrough."""
    f, i = F.lower(finding), F.lower(issue)
    diabetes = F.when(
        f.contains("diabetes") | f.contains("dm"),
        F.when(i.contains("type"), "diabetes_type")
        .when(i.contains("complication"), "diabetes_complications")
        .when(i.contains("control"), "diabetes_control"),
    )
    hf = F.when(
        f.contains("heart failure") | f.contains("chf") | f.contains("hf"),
        F.when(i.contains("type") | i.contains("systolic") | i.contains("diastolic"),
               "heart_failure_type")
        .when(i.contains("acute") | i.contains("chronic"), "heart_failure_acuity"),
    )
    ckd = F.when(f.contains("ckd") | f.contains("chronic kidney"), "ckd_stage")
    htn = F.when(f.contains("hypertension"), "hypertension_control")
    fracture = F.when(
        f.contains("fracture"),
        F.when(i.contains("episode") | i.contains("initial"), "fracture_episode"),
    )
    stroke = F.when(f.contains("stroke") | f.contains("cva"), "stroke_type")
    lat = F.when(category == "laterality", F.lit("laterality"))
    med_nec = F.when(category == "medical_necessity",
                     F.lit("procedure_medical_necessity"))
    return F.coalesce(diabetes, hf, ckd, htn, fracture, stroke, lat, med_nec)


def _priority_col(severity, encounter_type: str):
    """(:599-621) — encounter type is a batch-level constant here."""
    et = encounter_type.lower()
    crit = "stat" if "inpatient" in et else "urgent"
    high = "urgent" if ("inpatient" in et or "emergency" in et) else "routine"
    return (
        F.when(severity == "critical", crit)
        .when(severity == "high", high)
        .when(severity == "medium", "routine")
        .otherwise("deferred")
    )


def _inferred_impacts(finding):
    """(:623-647): HCC → CC_MCC → SPECIFICITY(always) → QUALITY."""
    f = F.lower(finding)
    parts = F.array(
        F.when(_contains_any(f, HCC_CONDITIONS), "HCC"),
        F.when(_contains_any(f, CC_CONDITIONS), "CC_MCC"),
        F.lit("SPECIFICITY"),
        F.when(_contains_any(f, QUALITY_CONDITIONS), "QUALITY"),
    )
    return F.array_join(F.filter(parts, lambda x: x.isNotNull()), ",")


def generate_queries(
    gaps: DataFrame,
    templates: DataFrame,
    encounter_type: str = "",
) -> DataFrame:
    """Gaps (with ``query_text``/``impact`` columns, docgaps.detect_gaps
    ``with_query=True``) → one structured coding query per gap
    (:423-597), prioritized per conversation (:737-753)."""
    g = gaps.withColumn(
        "template_key",
        template_key_col(F.col("finding"), F.col("issue"), F.col("category")),
    ).join(F.broadcast(templates), "template_key", "left")

    sev = F.col("severity")
    rev = (
        F.when(sev == "critical", REVENUE_IMPACT["critical"])
        .when(sev == "high", REVENUE_IMPACT["high"])
        .when(sev == "medium", REVENUE_IMPACT["medium"])
        .when(sev == "low", REVENUE_IMPACT["low"])
        .otherwise(DEFAULT_REVENUE_IMPACT)
    )
    priority = _priority_col(sev, encounter_type)
    prio_rank = (
        F.when(priority == "stat", 0).when(priority == "urgent", 1)
        .when(priority == "routine", 2).otherwise(3)
    )
    strength = (
        F.when(sev.isin("critical", "high"), "HIGH")
        .when(sev == "medium", "MEDIUM").otherwise("LOW")
    )
    out = g.select(
        "conv_id", "turn_idx", "start_offset", "finding", "category",
        "severity",
        F.sha2(F.concat_ws("\x00", "conv_id", "turn_idx", "start_offset",
                           "finding", "category"), 256).substr(1, 16).alias("query_id"),
        "template_key",
        # template question wins, else the gap's own query text (:548-559)
        F.coalesce(F.col("question"), F.col("query_text")).alias("question"),
        F.lit("pending").alias("status"),
        priority.alias("priority"),
        prio_rank.alias("_prio_rank"),
        F.coalesce(F.col("coding_impacts"),
                   _inferred_impacts(F.col("finding"))).alias("coding_impacts"),
        rev.alias("estimated_revenue_impact"),
        strength.alias("cer_strength"),
        F.coalesce(F.col("regulatory_basis"),
                   F.lit("ICD-10-CM Official Guidelines")).alias("regulatory_basis"),
        F.coalesce(F.col("n_options"), F.lit(0)).alias("n_options"),
    )
    w = Window.partitionBy("conv_id").orderBy(
        F.asc("_prio_rank"), F.desc("estimated_revenue_impact"),
        F.asc("turn_idx"), F.asc("start_offset"), F.asc("finding"),
    )
    return out.withColumn("query_rank", F.row_number().over(w)).drop("_prio_rank")


def query_batch(queries: DataFrame, gaps: DataFrame) -> DataFrame:
    """Per-conversation batch rollup (:755-803): priority counts, major
    impact flags, revenue at risk (= the GAP detector's severity-weighted
    estimate, :799 — not the sum of per-query impacts)."""
    from kgnorm.docgaps import gap_rollup

    by_prio = queries.groupBy("conv_id").agg(
        F.count("*").alias("total_queries"),
        F.sum((F.col("priority") == "stat").cast("long")).alias("n_stat"),
        F.sum((F.col("priority") == "urgent").cast("long")).alias("n_urgent"),
        F.sum((F.col("priority") == "routine").cast("long")).alias("n_routine"),
        F.sum((F.col("priority") == "deferred").cast("long")).alias("n_deferred"),
        F.max(F.col("coding_impacts").contains("DRG_CHANGE").cast("int"))
        .alias("drg_impact_possible"),
        F.max(F.col("coding_impacts").contains("HCC").cast("int"))
        .alias("hcc_impact_possible"),
    )
    rev = gap_rollup(gaps.select(
        "conv_id", "turn_idx", "start_offset", "finding",
        "gap_type", "category", "severity", "issue",
    )).select("conv_id", "revenue_at_risk")
    return by_prio.join(rev, "conv_id", "left")
