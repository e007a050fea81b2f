"""Clinical summarizer: problem lists, medication reconciliation,
one-liners, critical findings and per-patient rollups from the facts
table.

Port of ``backend/app/services/clinical_summarizer.py``:

* problem-priority table (:213-253), contains-match with max-priority
  (:362-367);
* problem status derivation (:352-360): historical → resolved,
  'chronic' in label → chronic, 'acute' in label → acute, else active;
* medication status (:394-399): absent/historical → discontinued;
* one-liner (:613-629): top-3 problems + active-med count,
  'Patient with <p1, p2, p3>, on <n> medications';
* critical findings (:631-658): term scan over condition labels
  (top 5 per patient).  NOTE the reference caps the COMBINED
  conditions + critical-lab-values list at 5 (``critical[:5]``, :658);
  ``critical_findings`` / ``critical_labs`` expose the legs separately
  (uncapped labs) for composability, and ``critical_combined`` applies
  the reference's shared cap — callers concatenating the two legs
  themselves can exceed 5 and should use ``critical_combined``;
* medication changes (:680-690): 'Discontinued: <drug>';
* problem-oriented rollup (:756-792): counts by active/chronic/resolved
  buckets.

Spark-first: every summary is a grouped aggregation over the facts
DataFrame — the priority lookup is a broadcast theta-join (label
CONTAINS term) against a 29-row dimension, top-k selections are rank
windows partitioned by conv_id, and the string assembly is
``concat_ws``/``array_join`` over ``collect_list`` structs sorted
in-JVM.  The reference's list order (Python stable sort over fact
insertion order) is nondeterministic under distribution; the
deterministic stand-in everywhere is (priority DESC, first_turn_idx,
first_start_offset, concept_name) — the same mention ordering invariant
the rest of the engine uses (kgnorm/rules.py:489).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

# clinical_summarizer.py:213-253
PROBLEM_PRIORITY: dict[str, int] = {
    "sepsis": 100, "myocardial infarction": 100, "stroke": 100,
    "pulmonary embolism": 100, "respiratory failure": 95,
    "cardiac arrest": 100, "anaphylaxis": 100,
    "pneumonia": 80, "acute kidney injury": 80,
    "gastrointestinal bleeding": 80, "diabetic ketoacidosis": 85,
    "acute pancreatitis": 75,
    "heart failure": 70, "copd": 65, "chronic kidney disease": 65,
    "cirrhosis": 70, "cancer": 75, "malignancy": 75,
    "diabetes mellitus": 50, "hypertension": 45, "hyperlipidemia": 40,
    "atrial fibrillation": 55, "coronary artery disease": 60,
    "obesity": 30, "gerd": 25, "osteoarthritis": 25,
    "depression": 35, "anxiety": 30,
}

# clinical_summarizer.py:641
CRITICAL_TERMS = ["sepsis", "arrest", "emergency", "acute", "critical", "severe"]

# clinical_summarizer.py:664-672
CRITICAL_LAB_RANGES: dict[str, tuple[float, float]] = {
    "potassium": (2.5, 6.5),
    "sodium": (120, 160),
    "glucose": (40, 500),
    "creatinine": (0, 10.0),
    "hemoglobin": (5.0, 20.0),
    "platelet": (20, 1000),
    "inr": (0, 5.0),
}

def _ord():
    # built lazily: F.desc() needs an active SparkContext, and this
    # module must import cleanly driver-side before any session exists
    return [F.desc("priority"), F.asc("first_turn_idx"),
            F.asc("first_start_offset"), F.asc("name")]


def priority_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(PROBLEM_PRIORITY.items()), "term string, prio int"
    )


def problem_list(facts: DataFrame, spark: SparkSession) -> DataFrame:
    """Prioritized problem list (clinical_summarizer.py:343-378).

    One row per non-absent condition fact with derived status and the
    max matching priority (0 when no term matches).
    """
    conds = facts.filter(
        (F.col("domain") == "condition") & (F.col("assertion") != "absent")
    ).select(
        "conv_id",
        F.col("concept_name").alias("name"),
        F.lower(F.col("concept_name")).alias("_ml"),
        # assertion/experiencer ride along so the priority re-group below
        # keeps ONE output row PER FACT (the reference emits one problem
        # per fact, clinical_summarizer.py:345), never merging facts that
        # differ only in those fields
        "assertion", "experiencer",
        "temporality", "first_turn_idx", "first_start_offset",
    )
    status = (
        F.when(F.col("temporality") == "historical", "resolved")
        .when(F.col("_ml").contains("chronic"), "chronic")
        .when(F.col("_ml").contains("acute"), "acute")
        .otherwise("active")
    )
    # contains theta-join against the 29-row broadcast dim, max wins
    dim = F.broadcast(priority_dim(spark))
    joined = conds.join(dim, F.col("_ml").contains(F.col("term")), "left")
    agg = joined.groupBy(
        "conv_id", "name", "_ml", "assertion", "experiencer", "temporality",
        "first_turn_idx", "first_start_offset",
    ).agg(F.coalesce(F.max("prio"), F.lit(0)).alias("priority"))
    w = Window.partitionBy("conv_id").orderBy(*_ord())
    return agg.select(
        "conv_id", "name", status.alias("status"), "priority",
        "first_turn_idx", "first_start_offset",
    ).withColumn("rank", F.row_number().over(w))


def medication_list(facts: DataFrame) -> DataFrame:
    """Medication reconciliation rows (clinical_summarizer.py:380-407):
    absent or historical → discontinued, else active."""
    meds = facts.filter(F.col("domain") == "drug")
    status = F.when(
        (F.col("assertion") == "absent") | (F.col("temporality") == "historical"),
        "discontinued",
    ).otherwise("active")
    return meds.select(
        "conv_id",
        F.col("concept_name").alias("name"),
        status.alias("status"),
        "first_turn_idx", "first_start_offset",
    )


def medication_changes(facts: DataFrame) -> DataFrame:
    """'Discontinued: <drug>' rows (clinical_summarizer.py:680-690)."""
    m = medication_list(facts).filter(F.col("status") == "discontinued")
    return m.select(
        "conv_id",
        F.concat(F.lit("Discontinued: "), F.col("name")).alias("change"),
    )


def one_liner(facts: DataFrame, spark: SparkSession) -> DataFrame:
    """Per-patient one-liner (clinical_summarizer.py:613-629)."""
    probs = problem_list(facts, spark)
    top3 = (
        probs.filter(F.col("rank") <= 3)
        .groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rank", "name"))),
                    lambda s: s["name"],
                ),
                ", ",
            ).alias("problem_str")
        )
    )
    med_count = (
        medication_list(facts)
        .groupBy("conv_id")
        .agg(F.sum((F.col("status") == "active").cast("long")).alias("med_count"))
    )
    base = facts.select("conv_id").distinct()
    j = base.join(top3, "conv_id", "left").join(med_count, "conv_id", "left")
    line = F.when(
        F.col("problem_str").isNull(),
        F.concat(F.lit("Patient "), F.col("conv_id"),
                 F.lit(" with no significant documented conditions")),
    ).otherwise(
        F.concat(F.lit("Patient with "), F.col("problem_str"),
                 F.lit(", on "), F.coalesce(F.col("med_count"), F.lit(0)),
                 F.lit(" medications"))
    )
    return j.select("conv_id", line.alias("one_liner"))


def critical_findings(facts: DataFrame, cap: int = 5) -> DataFrame:
    """'Critical condition: <label>' rows, top ``cap`` per patient
    (clinical_summarizer.py:631-658)."""
    conds = facts.filter(F.col("domain") == "condition")
    ml = F.lower(F.col("concept_name"))
    hit = None
    for t in CRITICAL_TERMS:
        c = ml.contains(t)
        hit = c if hit is None else (hit | c)
    w = Window.partitionBy("conv_id").orderBy(
        F.asc("first_turn_idx"), F.asc("first_start_offset"), F.asc("concept_name")
    )
    return (
        conds.filter(hit)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .select(
            "conv_id",
            F.concat(F.lit("Critical condition: "), F.col("concept_name"))
            .alias("finding"),
        )
    )


def critical_labs(values: DataFrame) -> DataFrame:
    """Critical lab values from the clinical-values extraction
    (clinical_summarizer.py:660-678): label contains a tracked lab name
    AND the numeric value is outside its critical range."""
    v = values.select(
        "conv_id",
        F.col("label").alias("lab"),
        F.lower(F.col("label")).alias("_ll"),
        F.col("value").cast("double").alias("val"),
        F.col("unit"),
    ).filter(F.col("val").isNotNull())
    out = None
    for lab, (low, high) in CRITICAL_LAB_RANGES.items():
        m = v.filter(F.col("_ll").contains(lab) & ((F.col("val") < low) | (F.col("val") > high)))
        out = m if out is None else out.unionByName(m)
    return out.select(
        "conv_id",
        F.concat(F.lit("Critical value: "), F.col("lab"), F.lit(" = "),
                 F.col("val").cast("string")).alias("finding"),
    )


def critical_combined(facts: DataFrame, values: DataFrame, cap: int = 5) -> DataFrame:
    """Shared-cap parity helper (clinical_summarizer.py:658): the
    reference builds ONE critical list — conditions first, then lab
    values — and caps the COMBINED list at ``critical[:5]``.

    The condition leg is pre-capped at the SAME ``cap``: conditions
    precede labs in the combined order, so no condition past the cap-th
    could survive the shared cap anyway.  Within the lab leg the
    reference keeps document order; the deterministic stand-in is the
    finding string (same policy as the module-level ordering note)."""
    conds = critical_findings(facts, cap=cap).select(
        "conv_id", "finding", F.lit(0).alias("_leg"))
    labs = critical_labs(values).select(
        "conv_id", "finding", F.lit(1).alias("_leg"))
    w = Window.partitionBy("conv_id").orderBy("_leg", "finding")
    return (
        conds.unionByName(labs)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .select("conv_id", "finding")
    )


def problem_summary(facts: DataFrame, spark: SparkSession) -> DataFrame:
    """Problem-oriented rollup (clinical_summarizer.py:756-792): per
    patient — total problems, counts in the active / chronic / resolved
    buckets (active bucket = active|acute|uncontrolled), med count."""
    probs = problem_list(facts, spark)
    bucket = (
        F.when(F.col("status").isin("active", "acute", "uncontrolled"), "active")
        .when(F.col("status") == "chronic", "chronic")
        .otherwise("resolved")
    )
    by_status = probs.withColumn("bucket", bucket).groupBy("conv_id").agg(
        F.count("*").alias("total_problems"),
        F.sum((F.col("bucket") == "active").cast("long")).alias("active_problems"),
        F.sum((F.col("bucket") == "chronic").cast("long")).alias("chronic_problems"),
        F.sum((F.col("bucket") == "resolved").cast("long")).alias("resolved_problems"),
    )
    meds = facts.filter(F.col("domain") == "drug").groupBy("conv_id").agg(
        F.count("*").alias("medication_count")
    )
    conf = facts.groupBy("conv_id").agg(
        F.round(F.avg("confidence"), 2).alias("confidence_score"),
        F.count("*").alias("total_facts"),
    )
    return (
        conf.join(by_status, "conv_id", "left")
        .join(meds, "conv_id", "left")
        .na.fill(0, ["total_problems", "active_problems", "chronic_problems",
                     "resolved_problems", "medication_count"])
    )


SBAR_TEMPLATE = (  # clinical_summarizer.py:158-171
    "\n**SITUATION**\n{situation}\n\n**BACKGROUND**\n{background}\n\n"
    "**ASSESSMENT**\n{assessment}\n\n**RECOMMENDATION**\n{recommendation}\n"
)


def pending_items(facts: DataFrame) -> DataFrame:
    """Pending clinical items (clinical_summarizer.py:692-702), top 5 per
    patient in the deterministic fact order."""
    ml = F.lower(F.col("concept_name"))
    item = (
        F.when(F.col("temporality") == "future",
               F.concat(F.lit("Pending: "), F.col("concept_name")))
        .when(ml.contains("pending") | ml.contains("ordered"), F.col("concept_name"))
    )
    w = Window.partitionBy("conv_id").orderBy(
        "first_turn_idx", "first_start_offset", "concept_name")
    return (
        facts.select("conv_id", item.alias("item"),
                     "first_turn_idx", "first_start_offset", "concept_name")
        .filter(F.col("item").isNotNull())
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= 5)
        .select("conv_id", "item", "_rk")
    )


def follow_up_items(facts: DataFrame, spark: SparkSession) -> DataFrame:
    """Follow-up needs (clinical_summarizer.py:704-718): uncontrolled →
    follow up, acute → close monitoring; top 5 in problem order."""
    probs = problem_list(facts, spark)
    item = (
        F.when(F.col("status") == "uncontrolled",
               F.concat(F.lit("Follow up on "), F.col("name")))
        .when(F.col("status") == "acute",
              F.concat(F.lit("Close monitoring for "), F.col("name")))
    )
    return (
        probs.select("conv_id", item.alias("item"), "rank")
        .filter(F.col("item").isNotNull())
        .withColumn("_rk", F.row_number().over(
            Window.partitionBy("conv_id").orderBy("rank")))
        .filter(F.col("_rk") <= 5)
        .select("conv_id", "item", "_rk")
    )


def generate_sbar(facts: DataFrame, spark: SparkSession) -> DataFrame:
    """SBAR handoff summary per patient (clinical_summarizer.py:720-754).

    situation = the one-liner; background = PMH (chronic + resolved
    problems in priority order, else the no-PMH default); assessment =
    top-5 '- name (status)' lines else 'Stable'; recommendation = up to
    3 pending + 3 follow-up bullets else 'Continue current plan'.
    """
    probs = problem_list(facts, spark)
    situation = one_liner(facts, spark)

    pmh = (
        probs.filter(F.col("status").isin("chronic", "resolved"))
        .groupBy("conv_id")
        .agg(F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("rank", "name"))),
                        lambda s: s["name"]), ", ").alias("background"))
    )
    assessment = (
        probs.filter(F.col("rank") <= 5)
        .groupBy("conv_id")
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "name", "status"))),
                lambda s: F.concat(F.lit("- "), s["name"], F.lit(" ("),
                                   s["status"], F.lit(")")),
            ), "\n").alias("assessment"))
    )
    rec_rows = (
        pending_items(facts).filter(F.col("_rk") <= 3)
        .select("conv_id", F.concat(F.lit("- "), F.col("item")).alias("line"),
                F.lit(0).alias("grp"), F.col("_rk"))
        .unionByName(
            follow_up_items(facts, spark).filter(F.col("_rk") <= 3)
            .select("conv_id", F.concat(F.lit("- "), F.col("item")).alias("line"),
                    F.lit(1).alias("grp"), F.col("_rk")))
    )
    recommendation = rec_rows.groupBy("conv_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("grp", "_rk", "line"))),
                        lambda s: s["line"]), "\n").alias("recommendation"))

    j = (
        situation.join(pmh, "conv_id", "left")
        .join(assessment, "conv_id", "left")
        .join(recommendation, "conv_id", "left")
    )
    sbar = F.concat(
        F.lit("\n**SITUATION**\n"), F.col("one_liner"),
        F.lit("\n\n**BACKGROUND**\n"),
        F.coalesce(F.col("background"), F.lit("No significant past medical history")),
        F.lit("\n\n**ASSESSMENT**\n"),
        F.coalesce(F.col("assessment"), F.lit("Stable")),
        F.lit("\n\n**RECOMMENDATION**\n"),
        F.coalesce(F.col("recommendation"), F.lit("Continue current plan")),
        F.lit("\n"),
    )
    return j.select("conv_id", sbar.alias("sbar"))
