"""Report generation: per-patient clinical-summary and per-document NLP
extraction reports as Markdown.

Port of ``backend/app/services/report_generator.py``:

* Markdown rendering (:422-485): '# title', '**Patient ID:** …  ',
  '## section' blocks, '- ' bullets, and the pipe-table renderer
  (header row, '---' separator, one row per record);
* clinical-summary content (:551-618): Summary (one-liner), Problem
  List ('<n> active problems identified' + Problem/Status/ICD-10
  table), Medications ('<n> medications' + bullets), Critical Findings
  bullets — each section emitted only when its data exists;
* NLP extraction content (:620-675): metric table (total mentions +
  per-domain counts + avg confidence as a percent) and the top-20
  mentions table (text[:50], type, concept id, confidence percent).

Spark-first: each report is ONE row per patient/conversation assembled
with ``concat_ws`` over rank-sorted ``collect_list`` structs — string
building never leaves the JVM, and there is no per-report Python.
Deterministic deviations (documented): no ``generated_at`` wall-clock
footer (the reference stamps ``datetime.now()``, :465 — unreproducible
across retries) and no random report id (:282-286); mention order is
the engine's (turn_idx, start_offset) invariant instead of Python list
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _bullets(items_col):
    return F.array_join(items_col, "\n")


def clinical_summary_report(facts: DataFrame, spark: SparkSession) -> DataFrame:
    """(conv_id, report_md) — Markdown clinical summary per patient
    (:551-618, :422-467)."""
    from kgnorm import summarizer

    probs = summarizer.problem_list(facts, spark)
    prob_tbl = probs.groupBy("conv_id").agg(
        F.count("*").alias("n_problems"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "name", "status"))),
                lambda s: F.concat(F.lit("| "), s["name"], F.lit(" | "),
                                   s["status"], F.lit(" |  |")),
            ), "\n").alias("prob_rows"),
    )
    meds = summarizer.medication_list(facts)
    med_tbl = meds.groupBy("conv_id").agg(
        F.count("*").alias("n_meds"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    "first_turn_idx", "first_start_offset", "name"))),
                lambda s: F.concat(F.lit("- "), s["name"]),
            ), "\n").alias("med_rows"),
    )
    crit = summarizer.critical_findings(facts).groupBy("conv_id").agg(
        F.array_join(F.array_sort(F.collect_list(
            F.concat(F.lit("- "), F.col("finding")))), "\n").alias("crit_rows"))
    ol = summarizer.one_liner(facts, spark)

    j = (ol.join(prob_tbl, "conv_id", "left")
         .join(med_tbl, "conv_id", "left")
         .join(crit, "conv_id", "left"))
    report = F.concat(
        F.lit("# Clinical Summary Report\n\n**Patient ID:** "),
        F.col("conv_id"), F.lit("  \n\n## Summary\n\n"), F.col("one_liner"),
        F.lit("\n"),
        F.when(
            F.col("n_problems").isNotNull(),
            F.concat(
                F.lit("\n## Problem List\n\n"),
                F.col("n_problems"), F.lit(" active problems identified\n\n"),
                F.lit("| Problem | Status | ICD-10 |\n| --- | --- | --- |\n"),
                F.col("prob_rows"), F.lit("\n"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("n_meds").isNotNull(),
            F.concat(F.lit("\n## Medications\n\n"),
                     F.col("n_meds"), F.lit(" medications\n\n"),
                     F.col("med_rows"), F.lit("\n")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("crit_rows").isNotNull(),
            F.concat(F.lit("\n## Critical Findings\n\n"),
                     F.col("crit_rows"), F.lit("\n")),
        ).otherwise(F.lit("")),
    )
    return j.select("conv_id", report.alias("report_md"))


def extraction_report(mentions: DataFrame) -> DataFrame:
    """(conv_id, report_md) — NLP extraction report per conversation
    (:620-675): metric table + top-20 mentions table."""
    dom = F.lower(F.coalesce(F.col("domain_hint"), F.lit("")))
    stats = mentions.groupBy("conv_id").agg(
        F.count("*").alias("total"),
        F.sum((dom == "condition").cast("long")).alias("n_cond"),
        F.sum((dom == "drug").cast("long")).alias("n_drug"),
        F.sum((dom == "measurement").cast("long")).alias("n_meas"),
        F.sum((dom == "procedure").cast("long")).alias("n_proc"),
        F.format_string("%.2f%%", F.avg("confidence") * 100).alias("avg_conf"),
    )
    top = mentions.select(
        "conv_id",
        F.struct(
            "turn_idx", "start_offset",
            F.substring("mention_text", 1, 50).alias("text"),
            F.coalesce(F.col("domain_hint"), F.lit("")).alias("mtype"),
            F.coalesce(F.col("omop_concept_id").cast("string"), F.lit("")).alias("cid"),
            F.format_string("%.2f%%", F.col("confidence") * 100).alias("conf"),
        ).alias("m"),
    ).groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                F.slice(F.array_sort(F.collect_list("m")), 1, 20),
                lambda s: F.concat(F.lit("| "), s["text"], F.lit(" | "),
                                   s["mtype"], F.lit(" | "), s["cid"],
                                   F.lit(" | "), s["conf"], F.lit(" |")),
            ), "\n").alias("mention_rows"))
    j = stats.join(top, "conv_id", "left")
    report = F.concat(
        F.lit("# NLP Extraction Report\n\n## Extraction Summary\n\n"
              "| Metric | Value |\n| --- | --- |\n"),
        F.lit("| Total Mentions | "), F.col("total"), F.lit(" |\n"),
        F.lit("| Conditions | "), F.col("n_cond"), F.lit(" |\n"),
        F.lit("| Medications | "), F.col("n_drug"), F.lit(" |\n"),
        F.lit("| Measurements | "), F.col("n_meas"), F.lit(" |\n"),
        F.lit("| Procedures | "), F.col("n_proc"), F.lit(" |\n"),
        F.lit("| Avg Confidence | "), F.col("avg_conf"), F.lit(" |\n"),
        F.lit("\n## Extracted Mentions\n\n"
              "| Text | Type | OMOP Concept | Confidence |\n"
              "| --- | --- | --- | --- |\n"),
        F.coalesce(F.col("mention_rows"), F.lit("")), F.lit("\n"),
    )
    return j.select("conv_id", report.alias("report_md"))
