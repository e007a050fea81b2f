"""Clinical calculators as column expressions.

Port of a representative set from
``backend/app/services/clinical_calculators.py`` (the reference's
remaining calculators — HAS-BLED, MELD, Wells, CURB-65, Framingham —
follow the identical boolean-points + bucket pattern):

* BMI + WHO classification (:46-120);
* CHA₂DS₂-VASc stroke-risk score with risk buckets and the reference's
  approximate annual-stroke-rate strings (:126-242);
* CKD-EPI 2021 race-free eGFR with G-staging (:464-570).

Spark-first: every calculator is a pure column expression (CASE chains,
``pow``) — whole-stage-codegen friendly, no UDF, no shuffle.
:func:`chadsvasc_flags_from_facts` derives the score's condition inputs
from the facts table (per-conversation boolean pivot), which is how a
transcripts-derived KG feeds the calculator at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def bmi_cols(weight_kg: Column, height_cm: Column) -> tuple[Column, Column, Column]:
    """(bmi, risk_level, interpretation) — clinical_calculators.py:46-120."""
    bmi = weight_kg / F.pow(height_cm / 100, 2)
    risk = (
        F.when(bmi < 18.5, "moderate")
        .when(bmi < 25, "low")
        .when(bmi < 30, "moderate")
        .when(bmi < 40, "high")
        .otherwise("very_high")
    )
    interp = (
        F.when(bmi < 18.5, "Underweight")
        .when(bmi < 25, "Normal weight")
        .when(bmi < 30, "Overweight")
        .when(bmi < 35, "Class I Obesity")
        .when(bmi < 40, "Class II Obesity")
        .otherwise("Class III Obesity (Morbid)")
    )
    return F.round(bmi, 1), risk, interp


def chadsvasc_cols(
    age: Column,
    female: Column,
    chf: Column,
    hypertension: Column,
    diabetes: Column,
    stroke_tia: Column,
    vascular: Column,
) -> tuple[Column, Column, Column]:
    """(score, risk_level, stroke_rate) — clinical_calculators.py:126-242."""
    b = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    age_pts = F.when(age >= 75, 2).when(age >= 65, 1).otherwise(0)
    score = (
        b(chf) + b(hypertension) + age_pts + b(diabetes)
        + F.when(stroke_tia, 2).otherwise(0) + b(vascular) + b(female)
    )
    risk = (
        F.when(score == 0, "low")
        .when(score == 1, "low_moderate")
        .when(score == 2, "moderate")
        .when(score <= 4, "high")
        .otherwise("very_high")
    )
    # reference's approximate annual stroke-rate strings (:192-228)
    rate = (
        F.when(score == 0, "0%")
        .when(score == 1, "1.3%")
        .when(score == 2, "2.2%")
        .when(score <= 4, F.concat(F.format_number(1.3 + (score - 1) * 1.5, 1), F.lit("%")))
        .otherwise(F.concat((6 + (score - 5) * 2).cast("string"), F.lit("%")))
    )
    return score, risk, rate


def egfr_ckdepi_cols(creatinine: Column, age: Column, female: Column) -> tuple[Column, Column, Column]:
    """(egfr, ckd_stage, risk_level) — 2021 race-free CKD-EPI
    (clinical_calculators.py:464-570)."""
    kappa = F.when(female, 0.7).otherwise(0.9)
    alpha = F.when(female, -0.241).otherwise(-0.302)
    ratio = creatinine / kappa
    egfr = (
        142
        * F.pow(F.least(ratio, F.lit(1.0)), alpha)
        * F.pow(F.greatest(ratio, F.lit(1.0)), F.lit(-1.200))
        * F.pow(F.lit(0.9938), age)
        * F.when(female, 1.012).otherwise(1.0)
    )
    egfr = F.round(egfr, 1)
    stage = (
        F.when(egfr >= 90, "G1").when(egfr >= 60, "G2").when(egfr >= 45, "G3a")
        .when(egfr >= 30, "G3b").when(egfr >= 15, "G4").otherwise("G5")
    )
    risk = (
        F.when(egfr >= 90, "low").when(egfr >= 60, "low_moderate")
        .when(egfr >= 45, "moderate").when(egfr >= 30, "moderate_high")
        .when(egfr >= 15, "high").otherwise("very_high")
    )
    return egfr, stage, risk


# condition keywords → CHA₂DS₂-VASc inputs; matches the normalized
# condition names the pipeline emits
_CHADSVASC_FLAGS = {
    "chf": ["heart failure"],
    "hypertension": ["hypertension"],
    "diabetes": ["diabetes"],
    "stroke_tia": ["stroke", "transient ischemic attack"],
    "vascular": ["myocardial infarction", "peripheral artery", "aortic plaque"],
}


def chadsvasc_flags_from_facts(facts: DataFrame) -> DataFrame:
    """Per-conversation boolean inputs from PRESENT condition facts —
    one grouped aggregation on the conversation key."""
    name = F.lower(F.col("concept_name"))
    present = F.col("assertion") == "present"
    aggs = []
    for flag, keywords in _CHADSVASC_FLAGS.items():
        cond = None
        for kw in keywords:
            c = name.contains(kw)
            cond = c if cond is None else (cond | c)
        aggs.append(F.max(F.when(present & cond, True).otherwise(False)).alias(flag))
    return facts.groupBy("conv_id").agg(*aggs)


def chadsvasc_from_facts(facts: DataFrame) -> DataFrame:
    """facts → per-conversation CHA₂DS₂-VASc (age/sex are not present in
    transcripts metadata, so the demographic points default to 0 —
    documented; callers with a patient dimension join it in and pass
    real columns to chadsvasc_cols)."""
    flags = chadsvasc_flags_from_facts(facts)
    score, risk, rate = chadsvasc_cols(
        F.lit(0), F.lit(False),
        F.col("chf"), F.col("hypertension"), F.col("diabetes"),
        F.col("stroke_tia"), F.col("vascular"),
    )
    return flags.select(
        "conv_id", "chf", "hypertension", "diabetes", "stroke_tia", "vascular",
        score.alias("chadsvasc_score"), risk.alias("risk_level"),
        rate.alias("stroke_rate"),
    )
