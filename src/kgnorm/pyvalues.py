"""Full clinical value extraction with offsets (pure Python kernel).

Complete port of ``backend/app/services/value_extraction.py``:
concept-ID table (:44-150), unit normalization (:152-221), frequency
(:223-247) and route (:249-275) canonicalization, vital/lab/measurement/
medication-dose patterns (:302-478), and the offset-based overlap removal
(:705-733).

Relationship to :mod:`kgnorm.values`: ``values.py`` is the Spark-native
(JVM regexp, whole-stage codegen) subset used for the high-volume
``clinical_values`` query with an independent DuckDB oracle; THIS module
is the byte-faithful reference port with character offsets, required by
the ensemble merge (:mod:`kgnorm.ensemble`), which resolves span overlaps
— offsets are not expressible with Spark's ``regexp_extract_all``.  It
runs inside the same Arrow-batched ``mapInPandas`` workers as the
dictionary scan, so the plan stays narrow (no shuffle).

All tables are reference data ported verbatim; value-type strings match
``app/models/clinical_value.py:19-26``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# value types (clinical_value.py:19-26)
LAB_RESULT = "lab_result"
VITAL_SIGN = "vital_sign"
MEDICATION_DOSE = "medication_dose"
MEASUREMENT = "measurement"

# OMOP concept IDs (value_extraction.py:44-150)
MEASUREMENT_CONCEPTS: dict[str, int] = {
    "bp": 3012888, "systolic": 3004249, "diastolic": 3012888,
    "hr": 3027018, "pulse": 3027018, "rr": 3024171,
    "temp": 3020891, "temperature": 3020891,
    "o2": 3016502, "spo2": 3016502, "o2 sat": 3016502, "sat": 3016502,
    "weight": 3025315, "height": 3036277, "bmi": 3038553,
    "glucose": 3004501, "sodium": 3019550, "na": 3019550,
    "potassium": 3023103, "k": 3023103, "chloride": 3014576, "cl": 3014576,
    "co2": 3015632, "bicarbonate": 3015632, "bun": 3013682,
    "creatinine": 3016723, "cr": 3016723, "egfr": 3049187,
    "calcium": 3006906, "ca": 3006906, "magnesium": 3001420, "mg": 3001420,
    "phosphorus": 3011904, "phos": 3011904,
    "ast": 3013721, "sgot": 3013721, "alt": 3006923, "sgpt": 3006923,
    "alp": 3035995, "alkaline phosphatase": 3035995,
    "bilirubin": 3024128, "total bilirubin": 3024128, "direct bilirubin": 3007220,
    "albumin": 3024561, "total protein": 3020630,
    "wbc": 3010813, "rbc": 3020416, "hemoglobin": 3000963, "hgb": 3000963,
    "hematocrit": 3009542, "hct": 3009542, "platelets": 3024929, "plt": 3024929,
    "mcv": 3023599, "mch": 3012030, "mchc": 3009744, "rdw": 3002888,
    "pt": 3034426, "inr": 3022217, "ptt": 3013466, "aptt": 3013466,
    "fibrinogen": 3005785,
    "troponin": 3025232, "trop": 3025232, "bnp": 3029435, "nt-probnp": 3029435,
    "ck": 3019170, "ck-mb": 3001582,
    "hba1c": 3004410, "a1c": 3004410, "hemoglobin a1c": 3004410,
    "tsh": 3016251, "t4": 3026300, "free t4": 3026300, "t3": 3005949,
    "cholesterol": 3027114, "total cholesterol": 3027114,
    "ldl": 3028437, "hdl": 3011884, "triglycerides": 3022192, "tg": 3022192,
    "ph": 3015736, "specific gravity": 3016436,
    "ef": 3027694, "lvef": 3027694, "ejection fraction": 3027694,
}

# unit normalization (value_extraction.py:152-221)
UNIT_NORMALIZATION: dict[str, str] = {
    "mg": "mg", "milligram": "mg", "milligrams": "mg",
    "g": "g", "gram": "g", "grams": "g",
    "mcg": "mcg", "microgram": "mcg", "micrograms": "mcg", "ug": "mcg",
    "kg": "kg", "kilogram": "kg",
    "ml": "mL", "milliliter": "mL", "milliliters": "mL",
    "l": "L", "liter": "L", "liters": "L",
    "dl": "dL", "deciliter": "dL",
    "mg/dl": "mg/dL", "mg/l": "mg/L", "mmol/l": "mmol/L", "meq/l": "mEq/L",
    "g/dl": "g/dL", "ng/ml": "ng/mL", "pg/ml": "pg/mL",
    "iu/l": "IU/L", "u/l": "U/L", "iu/ml": "IU/mL",
    "cells/ul": "cells/uL", "/ul": "/uL", "k/ul": "K/uL",
    "x10^3/ul": "K/uL", "x10^6/ul": "M/uL", "m/ul": "M/uL",
    "x10^9/l": "x10^9/L", "x10^12/l": "x10^12/L",
    "%": "%", "percent": "%",
    "f": "°F", "°f": "°F", "fahrenheit": "°F",
    "c": "°C", "°c": "°C", "celsius": "°C",
    "mmhg": "mmHg", "mm hg": "mmHg",
    "bpm": "bpm", "/min": "/min", "per minute": "/min", "breaths/min": "/min",
}

# frequency canonicalization (value_extraction.py:223-247) — ORDER matters
# (first matching pattern wins), so this is a list of pairs
FREQUENCY_PATTERNS: list[tuple[str, str]] = [
    (r"\bqd\b", "daily"),
    (r"\bdaily\b", "daily"),
    (r"\bonce daily\b", "daily"),
    (r"\bqhs\b", "at bedtime"),
    (r"\bhs\b", "at bedtime"),
    (r"\bbid\b", "twice daily"),
    (r"\btwice daily\b", "twice daily"),
    (r"\bb\.i\.d\.?\b", "twice daily"),
    (r"\btid\b", "three times daily"),
    (r"\bthree times daily\b", "three times daily"),
    (r"\bt\.i\.d\.?\b", "three times daily"),
    (r"\bqid\b", "four times daily"),
    (r"\bfour times daily\b", "four times daily"),
    (r"\bq\.i\.d\.?\b", "four times daily"),
    (r"\bprn\b", "as needed"),
    (r"\bas needed\b", "as needed"),
    (r"\bq(\d+)h\b", r"every \1 hours"),
    (r"\bevery (\d+) hours?\b", r"every \1 hours"),
    (r"\bweekly\b", "weekly"),
    (r"\bqweek\b", "weekly"),
    (r"\bmonthly\b", "monthly"),
    (r"\bqmonth\b", "monthly"),
]

# route canonicalization (value_extraction.py:249-275)
ROUTE_PATTERNS: list[tuple[str, str]] = [
    (r"\bpo\b", "oral"), (r"\boral\b", "oral"), (r"\bby mouth\b", "oral"),
    (r"\biv\b", "intravenous"), (r"\bintravenous\b", "intravenous"),
    (r"\bim\b", "intramuscular"), (r"\bintramuscular\b", "intramuscular"),
    (r"\bsc\b", "subcutaneous"), (r"\bsubq\b", "subcutaneous"),
    (r"\bsubcutaneous\b", "subcutaneous"),
    (r"\bsl\b", "sublingual"), (r"\bsublingual\b", "sublingual"),
    (r"\btopical\b", "topical"),
    (r"\binhaled\b", "inhaled"), (r"\binh\b", "inhaled"),
    (r"\bnasal\b", "nasal"),
    (r"\brectal\b", "rectal"), (r"\bpr\b", "rectal"),
    (r"\bophthalmic\b", "ophthalmic"), (r"\botic\b", "otic"),
    (r"\btransdermal\b", "transdermal"), (r"\bpatch\b", "transdermal"),
]


@dataclass
class ExtractedValue:
    """value_extraction.py:23-40 (core fields)."""

    text: str
    start_offset: int
    end_offset: int
    name: str
    value_type: str
    value: float | None = None
    value_secondary: float | None = None
    unit: str | None = None
    unit_normalized: str | None = None
    frequency: str | None = None
    route: str | None = None
    omop_concept_id: int | None = None
    confidence: float = 0.8


# compiled patterns (value_extraction.py:302-478); (pattern, name, default_unit)
_VITAL_PATTERNS = [
    (re.compile(r"\b(?:bp|blood pressure)\s*[:=]?\s*(\d{2,3})\s*/\s*(\d{2,3})\s*(?:mmhg|mm hg)?", re.IGNORECASE),
     "Blood Pressure", "mmHg"),
    (re.compile(r"(?<!\d)(\d{2,3})\s*/\s*(\d{2,3})\s*(?:mmhg|mm hg)", re.IGNORECASE),
     "Blood Pressure", "mmHg"),
    (re.compile(r"\b(?:hr|heart rate|pulse)\s*[:=]?\s*(\d{2,3})\s*(?:bpm|/min)?", re.IGNORECASE),
     "Heart Rate", "bpm"),
    (re.compile(r"\b(?:rr|resp(?:iratory)? rate)\s*[:=]?\s*(\d{1,2})\s*(?:/min|breaths?/min)?", re.IGNORECASE),
     "Respiratory Rate", "/min"),
    (re.compile(r"\b(?:temp(?:erature)?)\s*[:=]?\s*(\d{2,3}(?:\.\d)?)\s*(?:°?\s*[fc]|fahrenheit|celsius)?", re.IGNORECASE),
     "Temperature", "°F"),
    (re.compile(r"\b(?:o2\s*sat(?:uration)?|spo2|sao2|oxygen sat(?:uration)?)\s*[:=]?\s*(\d{2,3})\s*%?", re.IGNORECASE),
     "Oxygen Saturation", "%"),
    (re.compile(r"\b(?:weight|wt)\s*[:=]?\s*(\d{2,3}(?:\.\d)?)\s*(kg|lbs?|pounds?|kilograms?)?", re.IGNORECASE),
     "Weight", None),
    (re.compile(r"\b(?:height|ht)\s*[:=]?\s*(\d{1,3}(?:\.\d)?)\s*(cm|in|inches|m|feet|ft)?", re.IGNORECASE),
     "Height", None),
    (re.compile(r"\b(?:bmi)\s*[:=]?\s*(\d{1,2}(?:\.\d)?)", re.IGNORECASE),
     "BMI", "kg/m²"),
]

_LAB_PATTERNS = [
    (re.compile(
        r"\b(hemoglobin|hgb|hematocrit|hct|wbc|rbc|platelets?|plt|"
        r"sodium|na|potassium|k|chloride|cl|co2|bicarbonate|"
        r"bun|creatinine|cr|glucose|calcium|ca|magnesium|mg|phosphorus|phos|"
        r"ast|sgot|alt|sgpt|alp|alkaline phosphatase|bilirubin|albumin|"
        r"total protein|pt|inr|ptt|aptt|fibrinogen|"
        r"troponin|trop|bnp|nt-probnp|ck|ck-mb|"
        r"tsh|t4|free t4|t3|"
        r"cholesterol|ldl|hdl|triglycerides|tg|"
        r"hba1c|a1c|hemoglobin a1c|egfr)"
        r"\s*[:=]?\s*"
        r"(\d+(?:\.\d+)?)\s*"
        r"(mg/dl|mg/l|mmol/l|meq/l|g/dl|ng/ml|pg/ml|iu/l|u/l|"
        r"k/ul|m/ul|x10\^?[369]/[ul]l?|cells?/ul|/ul|"
        r"%|seconds?|sec|s)?",
        re.IGNORECASE), None, None),
    (re.compile(r"\b(?:hba1c|a1c|hemoglobin a1c)\s*[:=]?\s*(\d+(?:\.\d)?)\s*%?", re.IGNORECASE),
     "HbA1c", "%"),
    (re.compile(r"\begfr\s*[:=]?\s*[<>]?\s*(\d+(?:\.\d)?)\s*(?:ml/min)?", re.IGNORECASE),
     "eGFR", "mL/min/1.73m²"),
    (re.compile(r"\binr\s*[:=]?\s*(\d+(?:\.\d)?)", re.IGNORECASE), "INR", None),
]

_MEASUREMENT_PATTERNS = [
    (re.compile(r"\b(?:ef|lvef|ejection fraction)\s*[:=]?\s*(\d{1,2}(?:\.\d)?)\s*%?", re.IGNORECASE),
     "Ejection Fraction", "%"),
]

_MED_PATTERNS = [
    re.compile(
        r"\b([A-Z][a-z]+(?:\s+[A-Z][a-z]+)?)\s+"
        r"(\d+(?:\.\d+)?)\s*"
        r"(mg|mcg|g|ml|units?|iu)\s*"
        r"(?:(po|iv|im|sc|subq|sl|pr|topical|inhaled?|inh|patch)\s*)?"
        r"(qd|daily|bid|tid|qid|q\d+h|prn|"
        r"once daily|twice daily|three times daily|four times daily|"
        r"every \d+ hours?|as needed|weekly|monthly|at bedtime|hs|qhs)?",
        re.IGNORECASE),
    re.compile(r"\b([A-Z][a-z]+)\s+(\d+(?:\.\d+)?)\s*(mg|mcg|g|ml|units?|iu)", re.IGNORECASE),
]

_FREQ_COMPILED = [(re.compile(p), f) for p, f in FREQUENCY_PATTERNS]
_ROUTE_COMPILED = [(re.compile(p), r) for p, r in ROUTE_PATTERNS]


def normalize_unit(unit: str | None) -> str | None:
    """value_extraction.py:482-488 — table hit → canonical, else identity."""
    if not unit:
        return None
    return UNIT_NORMALIZATION.get(unit.lower().strip(), unit)


def extract_frequency(text: str) -> str | None:
    """value_extraction.py:490-499 — first matching pattern wins."""
    low = text.lower()
    for pattern, freq in _FREQ_COMPILED:
        m = pattern.search(low)
        if m:
            if r"\1" in freq:
                return pattern.sub(freq, m.group(0))
            return freq
    return None


def extract_route(text: str) -> str | None:
    """value_extraction.py:501-507."""
    low = text.lower()
    for pattern, route in _ROUTE_COMPILED:
        if pattern.search(low):
            return route
    return None


def concept_id(name: str) -> int | None:
    return MEASUREMENT_CONCEPTS.get(name.lower().strip())


def extract_vitals(text: str, offset: int = 0) -> list[ExtractedValue]:
    """value_extraction.py:509-548."""
    out = []
    for pattern, name, default_unit in _VITAL_PATTERNS:
        for m in pattern.finditer(text):
            try:
                if "Blood Pressure" in name:
                    value = float(m.group(1))
                    value2 = float(m.group(2))
                    unit = default_unit
                else:
                    value = float(m.group(1))
                    value2 = None
                    unit = m.group(2) if len(m.groups()) > 1 and m.group(2) else default_unit
                out.append(ExtractedValue(
                    text=m.group(0), start_offset=offset + m.start(), end_offset=offset + m.end(),
                    name=name, value_type=VITAL_SIGN, value=value, value_secondary=value2,
                    unit=unit, unit_normalized=normalize_unit(unit),
                    omop_concept_id=concept_id(name), confidence=0.9,
                ))
            except (ValueError, IndexError):
                continue
    return out


def extract_labs(text: str, offset: int = 0) -> list[ExtractedValue]:
    """value_extraction.py:550-586."""
    out = []
    for pattern, default_name, default_unit in _LAB_PATTERNS:
        for m in pattern.finditer(text):
            try:
                groups = m.groups()
                if default_name is None:
                    name = groups[0].strip()
                    value = float(groups[1])
                    unit = groups[2] if len(groups) > 2 else default_unit
                else:
                    name = default_name
                    value = float(groups[0])
                    unit = groups[1] if len(groups) > 1 and groups[1] else default_unit
                out.append(ExtractedValue(
                    text=m.group(0), start_offset=offset + m.start(), end_offset=offset + m.end(),
                    name=name, value_type=LAB_RESULT, value=value,
                    unit=unit, unit_normalized=normalize_unit(unit),
                    omop_concept_id=concept_id(name), confidence=0.85,
                ))
            except (ValueError, IndexError):
                continue
    return out


def extract_measurements(text: str, offset: int = 0) -> list[ExtractedValue]:
    """value_extraction.py:588-613."""
    out = []
    for pattern, name, default_unit in _MEASUREMENT_PATTERNS:
        for m in pattern.finditer(text):
            try:
                out.append(ExtractedValue(
                    text=m.group(0), start_offset=offset + m.start(), end_offset=offset + m.end(),
                    name=name, value_type=MEASUREMENT, value=float(m.group(1)),
                    unit=default_unit, unit_normalized=normalize_unit(default_unit),
                    omop_concept_id=concept_id(name), confidence=0.9,
                ))
            except (ValueError, IndexError):
                continue
    return out


def extract_medication_doses(text: str, offset: int = 0) -> list[ExtractedValue]:
    """value_extraction.py:615-661."""
    out = []
    for pattern in _MED_PATTERNS:
        for m in pattern.finditer(text):
            try:
                groups = m.groups()
                name = groups[0].strip()
                dose = float(groups[1])
                unit = groups[2] if len(groups) > 2 else None
                full_text = m.group(0)
                route = None
                frequency = None
                if len(groups) > 3 and groups[3]:
                    route = extract_route(groups[3])
                if len(groups) > 4 and groups[4]:
                    frequency = extract_frequency(groups[4])
                if not route:
                    route = extract_route(full_text)
                if not frequency:
                    frequency = extract_frequency(full_text)
                out.append(ExtractedValue(
                    text=full_text, start_offset=offset + m.start(), end_offset=offset + m.end(),
                    name=name, value_type=MEDICATION_DOSE, value=dose,
                    unit=unit, unit_normalized=normalize_unit(unit),
                    frequency=frequency, route=route, confidence=0.85,
                ))
            except (ValueError, IndexError):
                continue
    return out


def _remove_overlapping(values: list[ExtractedValue]) -> list[ExtractedValue]:
    """Keep the longer span on overlap (value_extraction.py:705-733,
    including its greedy remove-and-append re-ordering)."""
    if not values:
        return values
    filtered: list[ExtractedValue] = []
    for value in values:
        overlaps = False
        for accepted in filtered:
            if value.start_offset < accepted.end_offset and value.end_offset > accepted.start_offset:
                if len(value.text) > len(accepted.text):
                    filtered.remove(accepted)
                    filtered.append(value)
                overlaps = True
                break
        if not overlaps:
            filtered.append(value)
    return sorted(filtered, key=lambda x: x.start_offset)


def extract_all(
    text: str,
    offset: int = 0,
    include_vitals: bool = True,
    include_labs: bool = True,
    include_measurements: bool = True,
    include_medications: bool = True,
) -> list[ExtractedValue]:
    """value_extraction.py:663-703: all extractors, position sort,
    overlap removal."""
    results: list[ExtractedValue] = []
    if include_vitals:
        results.extend(extract_vitals(text, offset))
    if include_labs:
        results.extend(extract_labs(text, offset))
    if include_measurements:
        results.extend(extract_measurements(text, offset))
    if include_medications:
        results.extend(extract_medication_doses(text, offset))
    results.sort(key=lambda x: (x.start_offset, -x.end_offset))
    return _remove_overlapping(results)
