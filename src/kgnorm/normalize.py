"""Brand→generic drug and abbreviation→condition normalization maps.

Reference: backend/app/services/extraction_pipeline.py:564-582 (drug map,
17 entries) and :585-608 (condition map, 23 entries), ported verbatim as
data.  Spark-side these are tiny literal maps applied with
``element_at(map, lower(term))`` — constant-folded, no join, no UDF.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, functions as F

DRUG_NORMALIZATION = {
    "lantus": "insulin glargine",
    "humalog": "insulin lispro",
    "novolog": "insulin aspart",
    "lasix": "furosemide",
    "coreg": "carvedilol",
    "norvasc": "amlodipine",
    "zoloft": "sertraline",
    "lipitor": "atorvastatin",
    "crestor": "rosuvastatin",
    "prilosec": "omeprazole",
    "nexium": "esomeprazole",
    "zofran": "ondansetron",
    "benadryl": "diphenhydramine",
    "tylenol": "acetaminophen",
    "advil": "ibuprofen",
    "motrin": "ibuprofen",
    "aleve": "naproxen",
}

CONDITION_NORMALIZATION = {
    "htn": "hypertension",
    "dm": "type 2 diabetes mellitus",
    "dm2": "type 2 diabetes mellitus",
    "dm1": "type 1 diabetes mellitus",
    "chf": "heart failure",
    "hfref": "heart failure with reduced ejection fraction",
    "hfpef": "heart failure with preserved ejection fraction",
    "cad": "coronary artery disease",
    "afib": "atrial fibrillation",
    "a-fib": "atrial fibrillation",
    "copd": "chronic obstructive pulmonary disease",
    "ckd": "chronic kidney disease",
    "aki": "acute kidney injury",
    "dka": "diabetic ketoacidosis",
    "tia": "transient ischemic attack",
    "dvt": "deep vein thrombosis",
    "bph": "benign prostatic hyperplasia",
    "gerd": "gastroesophageal reflux disease",
    "osa": "obstructive sleep apnea",
    "gad": "generalized anxiety disorder",
    "uti": "urinary tract infection",
    "sob": "shortness of breath",
}


def _map_col(mapping: dict[str, str]) -> Column:
    return F.create_map(*[F.lit(x) for x in chain.from_iterable(mapping.items())])


def normalize_drug(col) -> Column:
    """Brand name → generic, identity otherwise (extraction_pipeline.py:564-582)."""
    return F.coalesce(F.element_at(_map_col(DRUG_NORMALIZATION), F.lower(col)), F.lower(col))


def normalize_condition(col) -> Column:
    """Abbreviation → full condition name (extraction_pipeline.py:585-608)."""
    return F.coalesce(F.element_at(_map_col(CONDITION_NORMALIZATION), F.lower(col)), F.lower(col))
