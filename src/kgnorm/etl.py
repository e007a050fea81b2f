"""Per-domain OMOP ETL transforms: SourceRecord DataFrames → OMOP CDM
occurrence tables.

Port of ``backend/app/etl/condition_etl.py`` (:62-98 concept maps,
:187-296 lookup cascade, :381-434 transform), ``drug_etl.py`` (:67-128
maps, :238-301 route/quantity/date helpers, :303-376 transform) and
``measurement_etl.py`` (:68-157 maps, :243-330 value/operator parsing,
:331-356 type resolution, :358-425 transform).

Spark-first: the reference transforms ONE record per awaited DB
round-trip with per-process dict caches; here each domain is a single
declarative plan —

* concept lookup = dedup-before-join on distinct (code, vocabulary),
  then two broadcast hash joins against the concept dimension (source
  concept) and the 'Maps to' relationship (standard concept), exactly
  the shape of the linking cascade;
* all constant maps (status/route/unit/operator/type) are CASE chains
  or tiny ``create_map`` literals — pure codegen, no UDF;
* person resolution is a broadcast join against the person dimension
  instead of a caller-supplied ``person_id`` int.

Preserved quirks:

* ``value_text`` operator detection iterates the OPERATOR_CONCEPT_MAP in
  insertion order with ``startswith`` (measurement_etl.py:275-287), so
  '<=5' matches '<' first → operator 4171756 and an UNPARSEABLE '=5'
  number (stays NULL); same for '>='.
* source_value is '<SYSTEM>:<code>' truncated to 50 chars
  (condition_etl.py:414-416).
* unmapped codes keep concept_id 0 (condition_etl.py:236).
* unit mapping tries the EXACT unit string before lowercasing
  (measurement_etl.py:243-252).
* missing start dates default to the run date (condition_etl.py:336,
  drug_etl.py:271) — ``current_date()`` here; missing drug end dates
  default to start + 30 days (drug_etl.py:284, default_days_supply).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------------------
# constant maps (verbatim from the reference; they are published OMOP ids)
# ---------------------------------------------------------------------------

# condition_etl.py:62-69
CONDITION_TYPE_CONCEPT_MAP = {
    "encounter_diagnosis": 32817,
    "problem_list": 32818,
    "claim_diagnosis": 32840,
    "registry": 32879,
    "ehr": 32817,
}

# condition_etl.py:72-77
CONDITION_STATUS_CONCEPT_MAP = {
    "active": 32904,
    "inactive": 32895,
    "resolved": 32893,
}

DEFAULT_CONDITION_TYPE_CONCEPT_ID = 32817  # condition_etl.py:80
DEFAULT_DRUG_TYPE_CONCEPT_ID = 32817  # drug_etl.py:128
DEFAULT_MEASUREMENT_TYPE_CONCEPT_ID = 32817  # measurement_etl.py:157
DEFAULT_DAYS_SUPPLY = 30  # drug_etl.py:146

# condition_etl.py:83-98 (drug/measurement variants are subsets)
CODE_SYSTEM_VOCABULARY_MAP = {
    "icd9": "ICD9CM",
    "icd9cm": "ICD9CM",
    "icd-9": "ICD9CM",
    "icd-9-cm": "ICD9CM",
    "icd10": "ICD10CM",
    "icd10cm": "ICD10CM",
    "icd-10": "ICD10CM",
    "icd-10-cm": "ICD10CM",
    "snomed": "SNOMED",
    "snomedct": "SNOMED",
    "snomed-ct": "SNOMED",
    "rxnorm": "RxNorm",
    "ndc": "NDC",
    "loinc": "LOINC",
    "2.16.840.1.113883.6.96": "SNOMED",
    "2.16.840.1.113883.6.90": "ICD10CM",
    "2.16.840.1.113883.6.103": "ICD9CM",
    "2.16.840.1.113883.6.1": "LOINC",
}

# drug_etl.py:67-74
DRUG_TYPE_CONCEPT_MAP = {
    "prescription": 32839,
    "dispense": 32838,
    "administration": 32817,
    "claim": 32840,
    "ehr": 32817,
}

# drug_etl.py:76-117
ROUTE_CONCEPT_MAP = {
    "oral": 4128794, "po": 4128794, "by mouth": 4128794, "orally": 4128794,
    "intravenous": 4302612, "iv": 4302612, "ivpb": 4302612,
    "subcutaneous": 4132161, "subq": 4132161, "sc": 4132161, "sq": 4132161,
    "intramuscular": 4303155, "im": 4303155,
    "inhalation": 45956874, "inhaled": 45956874, "nebulized": 45956874,
    "topical": 4186832, "external": 4186832,
    "transdermal": 4302254, "patch": 4302254,
    "ophthalmic": 4184451, "eye": 4184451,
    "otic": 4023156, "ear": 4023156,
    "nasal": 4262914, "intranasal": 4262914,
    "rectal": 4290759, "pr": 4290759,
}

# measurement_etl.py:68-75
MEASUREMENT_TYPE_CONCEPT_MAP = {
    "lab": 32856,
    "vital": 32836,
    "vital_sign": 32836,
    "vitals": 32836,
    "ehr": 32817,
    "registry": 32879,
}

# measurement_etl.py:78-137 — exact-string keys first, then lowercase retry
UNIT_CONCEPT_MAP = {
    "mg/dl": 8840, "mg/dL": 8840, "g/dl": 8713, "g/dL": 8713,
    "mmol/l": 8753, "mmol/L": 8753, "meq/l": 9557, "meq/L": 9557,
    "ng/ml": 8842, "ng/mL": 8842, "ug/dl": 8837, "ug/dL": 8837,
    "pg/ml": 8845, "pg/mL": 8845,
    "/uL": 8784, "/ul": 8784, "10*3/uL": 8848, "10*6/uL": 8815,
    "cells/uL": 8784,
    "%": 8554, "percent": 8554,
    "degc": 586323, "degf": 9289, "celsius": 586323, "fahrenheit": 9289,
    "C": 586323, "F": 9289,
    "mmhg": 8876, "mm[hg]": 8876, "mmHg": 8876,
    "kg": 9529, "lb": 9529, "lbs": 9529,
    "cm": 8582, "in": 9330, "inch": 9330, "inches": 9330, "m": 8582,
    "/min": 8541, "bpm": 8541, "beats/min": 8541, "breaths/min": 8541,
    "sec": 8555, "s": 8555, "min": 8550, "h": 8505, "hr": 8505,
    "kg/m2": 9531, "kg/m^2": 9531,
}

# measurement_etl.py:140-147 — INSERTION ORDER IS SEMANTIC (startswith scan)
OPERATOR_CONCEPT_MAP = [
    ("=", 4172703),
    ("<", 4171756),
    ("<=", 4171754),
    (">", 4172704),
    (">=", 4171755),
    ("~", 4172703),
]


def _map_lit(d: dict):
    return F.create_map(*[F.lit(x) for kv in d.items() for x in kv])


def normalize_code_system(col):
    """Source system name/OID → OMOP vocabulary id, passthrough when
    unknown (condition_etl.py:171-186)."""
    norm = F.lower(F.trim(col))
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.coalesce(_map_lit(CODE_SYSTEM_VOCABULARY_MAP)[norm], col)
    )


def _source_value(code, vocab):
    """'<SYSTEM>:<code>' truncated to 50 (condition_etl.py:414-416)."""
    sv = F.when(vocab.isNotNull(), F.concat(vocab, F.lit(":"), F.coalesce(code, F.lit("")))) \
        .otherwise(code)
    return F.substring(sv, 1, 50)


def _lookup_concepts(records: DataFrame, concepts: DataFrame,
                     relationships: DataFrame) -> DataFrame:
    """Attach (_concept_id, _source_concept_id) for (code, code_system).

    Mirrors condition_etl.py:187-296: exact concept-code match in the
    normalized vocabulary → source concept; 'Maps to' relationship →
    standard concept; unmapped → 0/NULL.  Dedup-before-join: distinct
    codes only touch the broadcast dims once, then rejoin — mention-level
    skew never reaches the dimension join.
    """
    # '' stand-ins keep NULL code/vocab rows joinable (equi-join drops
    # NULL keys); they can never match a real concept_code
    keyed = records.withColumn(
        "_vocab", F.coalesce(normalize_code_system(F.col("code_system")), F.lit(""))
    )
    distinct_codes = keyed.select(
        F.upper(F.coalesce(F.col("code"), F.lit(""))).alias("_code_u"), "_vocab"
    ).distinct()

    src_dim = F.broadcast(concepts.select(
        F.upper(F.col("concept_code")).alias("_code_u"),
        F.col("vocabulary_id").alias("_vocab"),
        F.col("concept_id").alias("_src_id"),
    ))
    rel_dim = F.broadcast(
        relationships.filter(F.col("relationship_id") == "Maps to").select(
            F.col("concept_id_1").alias("_src_id"),
            F.col("concept_id_2").alias("_std_id"),
        )
    )
    looked = (
        distinct_codes.join(src_dim, ["_code_u", "_vocab"], "left")
        .join(rel_dim, "_src_id", "left")
        .select(
            "_code_u", "_vocab",
            F.coalesce(F.col("_std_id"), F.lit(0)).alias("_concept_id"),
            F.col("_src_id").alias("_source_concept_id"),
        )
    )
    return keyed.withColumn(
        "_code_u", F.upper(F.coalesce(F.col("code"), F.lit("")))
    ).join(F.broadcast(looked), ["_code_u", "_vocab"], "left")


def _person_id(records: DataFrame, persons: DataFrame) -> DataFrame:
    """Broadcast person-dimension resolution (the reference takes
    person_id as a caller argument per record)."""
    dim = F.broadcast(persons.select(
        F.col("patient_source_id").alias("patient_source_id"),
        F.col("person_id").alias("person_id"),
    ))
    return records.join(dim, "patient_source_id", "left")


def condition_occurrences(
    conditions: DataFrame,
    concepts: DataFrame,
    relationships: DataFrame,
    persons: DataFrame,
    default_type_concept_id: int = DEFAULT_CONDITION_TYPE_CONCEPT_ID,
) -> DataFrame:
    """SourceCondition rows → OMOP Condition_Occurrence
    (condition_etl.py:381-434)."""
    r = _person_id(_lookup_concepts(conditions, concepts, relationships), persons)
    status = F.lower(F.coalesce(F.col("status"), F.lit("")))
    status_concept = _map_lit(CONDITION_STATUS_CONCEPT_MAP)[status]
    onset = F.col("onset_datetime")
    return r.select(
        F.col("source_id").alias("condition_source_id"),
        "person_id",
        F.col("_concept_id").cast("long").alias("condition_concept_id"),
        F.coalesce(onset.cast("date"), F.current_date()).alias("condition_start_date"),
        onset.alias("condition_start_datetime"),
        F.col("abatement_datetime").cast("date").alias("condition_end_date")
        if "abatement_datetime" in r.columns
        else F.lit(None).cast("date").alias("condition_end_date"),
        F.lit(default_type_concept_id).cast("long").alias("condition_type_concept_id"),
        status_concept.cast("long").alias("condition_status_concept_id"),
        F.col("visit_source_id").alias("visit_source_id")
        if "visit_source_id" in r.columns
        else F.lit(None).cast("string").alias("visit_source_id"),
        _source_value(F.col("code"), F.col("code_system")).alias("condition_source_value"),
        F.col("_source_concept_id").cast("long").alias("condition_source_concept_id"),
        F.col("status").alias("condition_status_source_value"),
    )


def drug_exposures(
    drugs: DataFrame,
    concepts: DataFrame,
    relationships: DataFrame,
    persons: DataFrame,
    default_type_concept_id: int = DEFAULT_DRUG_TYPE_CONCEPT_ID,
    default_days_supply: int = DEFAULT_DAYS_SUPPLY,
) -> DataFrame:
    """SourceDrug rows → OMOP Drug_Exposure (drug_etl.py:303-376)."""
    r = _person_id(_lookup_concepts(drugs, concepts, relationships), persons)
    route_l = F.lower(F.trim(F.col("route")))
    route_concept = _map_lit(ROUTE_CONCEPT_MAP)[route_l]
    start_date = F.coalesce(F.col("start_datetime").cast("date"), F.current_date())
    # end: explicit, else start + default_days_supply (drug_etl.py:278-284)
    end_date = F.coalesce(
        F.col("end_datetime").cast("date"),
        F.date_add(start_date, default_days_supply),
    )
    # quantity: digits+dot sweep over the dose string (drug_etl.py:238-249)
    dose_str = F.col("dose_value").cast("string")
    cleaned = F.regexp_replace(dose_str, "[^0-9.]", "")
    quantity = F.when(F.length(cleaned) > 0, (cleaned).try_cast("double"))
    days_supply = F.when(
        F.col("end_datetime").isNotNull(),
        F.datediff(end_date, start_date),
    )  # reference only derives it when both dates exist (drug_etl.py:336-338)
    return r.select(
        F.col("source_id").alias("drug_source_id"),
        "person_id",
        F.col("_concept_id").cast("long").alias("drug_concept_id"),
        start_date.alias("drug_exposure_start_date"),
        F.col("start_datetime").alias("drug_exposure_start_datetime"),
        end_date.alias("drug_exposure_end_date"),
        F.col("end_datetime").alias("drug_exposure_end_datetime"),
        F.lit(default_type_concept_id).cast("long").alias("drug_type_concept_id"),
        quantity.alias("quantity"),
        days_supply.cast("int").alias("days_supply"),
        (F.col("sig") if "sig" in r.columns else F.col("frequency")).alias("sig"),
        route_concept.cast("long").alias("route_concept_id"),
        _source_value(F.col("code"), F.col("code_system")).alias("drug_source_value"),
        F.col("_source_concept_id").cast("long").alias("drug_source_concept_id"),
        F.substring(F.col("route"), 1, 50).alias("route_source_value"),
        F.substring(F.col("dose_unit"), 1, 50).alias("dose_unit_source_value"),
    )


def _unit_concept(unit):
    """Exact match first, then the LOWERCASED unit against the SAME
    mixed-case map (measurement_etl.py:243-252) — so 'MMHG'→'mmhg' hits
    but '10*3/UL'→'10*3/ul' misses, exactly like ``dict.get(unit.lower())``
    on the original table."""
    m = _map_lit(UNIT_CONCEPT_MAP)
    return F.coalesce(m[unit], m[F.lower(unit)])


def _operator_and_value(value_numeric, value_text):
    """(value_as_number, operator_concept_id) with the reference's
    insertion-order startswith scan (measurement_etl.py:264-287):
    '<=' and '>=' are shadowed by '<' / '>' and '=' matches first.
    """
    txt = F.trim(value_text)
    op = F.lit(None).cast("long")
    num_after = F.lit(None).cast("double")
    matched = F.lit(False)
    for sym, concept in OPERATOR_CONCEPT_MAP:
        hit = ~matched & txt.startswith(sym)
        op = F.when(hit, F.lit(concept)).otherwise(op)
        num_after = F.when(
            hit, F.trim(F.substr(txt, F.lit(len(sym) + 1))).try_cast("double")
        ).otherwise(num_after)
        matched = matched | txt.startswith(sym)
    # a successfully-parsed operator suffix OVERWRITES value_numeric
    # (measurement_etl.py:269-281: value_as_number is reassigned inside
    # the try); a failed parse falls back to the numeric column
    value = F.when(num_after.isNotNull(), num_after) \
        .otherwise(value_numeric.cast("double"))
    return value, op


def measurements(
    meas: DataFrame,
    concepts: DataFrame,
    relationships: DataFrame,
    persons: DataFrame,
    default_type_concept_id: int = DEFAULT_MEASUREMENT_TYPE_CONCEPT_ID,
) -> DataFrame:
    """SourceMeasurement rows → OMOP Measurement (measurement_etl.py:358-425)."""
    r = _person_id(_lookup_concepts(meas, concepts, relationships), persons)
    value, op = _operator_and_value(F.col("value_numeric"), F.col("value_text"))
    # type: explicit measurement_type first, else LOINC hint → lab, else
    # default (measurement_etl.py:331-356)
    loinc_hint = F.when(
        F.lower(F.col("code_system")).contains("loinc"), F.lit(32856)
    ).otherwise(F.lit(default_type_concept_id))
    if "measurement_type" in meas.columns:
        mtype = F.coalesce(
            _map_lit(MEASUREMENT_TYPE_CONCEPT_MAP)[
                F.lower(F.trim(F.col("measurement_type")))],
            loinc_hint,
        )
    else:
        mtype = loinc_hint
    return r.select(
        F.col("source_id").alias("measurement_source_id"),
        "person_id",
        F.col("_concept_id").cast("long").alias("measurement_concept_id"),
        F.col("effective_datetime").cast("date").alias("measurement_date"),
        F.col("effective_datetime").alias("measurement_datetime"),
        mtype.cast("long").alias("measurement_type_concept_id"),
        op.alias("operator_concept_id"),
        value.alias("value_as_number"),
        _unit_concept(F.col("unit")).cast("long").alias("unit_concept_id"),
        F.col("range_low").cast("double").alias("range_low"),
        F.col("range_high").cast("double").alias("range_high"),
        _source_value(F.col("code"), F.col("code_system")).alias("measurement_source_value"),
        F.col("_source_concept_id").cast("long").alias("measurement_source_concept_id"),
        F.substring(F.col("unit"), 1, 50).alias("unit_source_value"),
        F.substring(F.col("value_text"), 1, 50).alias("value_source_value"),
    )


def etl_stats(occurrences: DataFrame, concept_col: str) -> DataFrame:
    """Batch rollup mirroring ETLResult counters (condition_etl.py:120-140):
    processed / created / unmapped."""
    return occurrences.agg(
        F.count("*").alias("total_processed"),
        F.count("*").alias("created"),
        F.sum((F.col(concept_col) == 0).cast("long")).alias("unmapped_codes"),
    )


# ---------------------------------------------------------------------------
# person / visit / procedure / observation / death ETL
# (etl/person_etl.py, visit_etl.py, procedure_etl.py, observation_etl.py,
#  death_etl.py)
# ---------------------------------------------------------------------------

# person_etl.py:70-160
GENDER_CONCEPT_MAP = {"male": 8507, "female": 8532, "other": 8551, "unknown": 8551}
GENDER_SOURCE_MAP = {
    "m": 8507, "male": 8507, "f": 8532, "female": 8532,
    "o": 8551, "other": 8551, "u": 8551, "unknown": 8551, "un": 8551,
    "undifferentiated": 8551, "ambiguous": 8570,
}
RACE_CONCEPT_MAP = {
    "white": 8527, "caucasian": 8527, "european": 8527, "w": 8527, "2106-3": 8527,
    "black": 8516, "black or african american": 8516, "african american": 8516,
    "african-american": 8516, "b": 8516, "2054-5": 8516,
    "asian": 8515, "a": 8515, "2028-9": 8515,
    "american indian": 8657, "american indian or alaska native": 8657,
    "alaska native": 8657, "native american": 8657, "1002-5": 8657,
    "native hawaiian": 8557, "native hawaiian or other pacific islander": 8557,
    "pacific islander": 8557, "hawaiian": 8557, "2076-8": 8557,
    "other": 8522, "other race": 8522, "multiracial": 8522, "mixed": 8522,
    "2131-1": 8522,
    "unknown": 8552, "u": 8552, "declined": 8552, "refused": 8552,
    "not reported": 8552,
}
ETHNICITY_CONCEPT_MAP = {
    "hispanic": 38003563, "hispanic or latino": 38003563, "latino": 38003563,
    "latina": 38003563, "latinx": 38003563, "h": 38003563, "y": 38003563,
    "2135-2": 38003563,
    "not hispanic": 38003564, "not hispanic or latino": 38003564,
    "non-hispanic": 38003564, "n": 38003564, "2186-5": 38003564,
    "unknown": 0, "u": 0, "declined": 0, "refused": 0,
}
DEFAULT_GENDER_CONCEPT_ID = 8551   # person_etl.py:162
DEFAULT_RACE_CONCEPT_ID = 8552     # :163
DEFAULT_ETHNICITY_CONCEPT_ID = 0   # :164
DEFAULT_BIRTH_YEAR = 1900          # :396-397

# visit_etl.py:56-115
VISIT_CONCEPT_MAP = {
    "inpatient": 9201, "outpatient": 9202, "emergency": 9203,
    "observation": 9201, "home": 581476, "telehealth": 581478,
    "unknown": 9202,
}
DEFAULT_VISIT_TYPE_CONCEPT_ID = 32817

# procedure_etl.py:53-67
PROCEDURE_TYPE_CONCEPT_MAP = {
    "ehr": 32817, "claim": 32840, "registry": 32879,
    "primary": 44786631, "secondary": 44786632,
}
PROCEDURE_STATUS_INCLUDE = {  # status → include-in-CDM flag
    "completed": True, "in_progress": True, "not_done": False, "unknown": True,
}
DEFAULT_PROCEDURE_TYPE_CONCEPT_ID = 32817

# observation_etl.py:72-104
VALUE_CONCEPT_MAP = {
    "yes": 4188539, "no": 4188540, "true": 4188539, "false": 4188540,
    "current smoker": 4298794, "former smoker": 4310250,
    "never smoker": 4144272, "non-smoker": 4144272,
    "current drinker": 4041306, "former drinker": 4041306,
    "non-drinker": 4144272,
    "mild": 4116186, "moderate": 4116186, "severe": 4087703,
    "positive": 9191, "negative": 9189, "detected": 9191, "not detected": 9189,
}
DEFAULT_OBSERVATION_TYPE_CONCEPT_ID = 32817

# death_etl.py:49-56
DEATH_TYPE_CONCEPT_MAP = {
    "ehr": 32817, "death_certificate": 32885, "autopsy": 32886,
    "registry": 32879, "social_security": 32885, "ssdi": 32885,
}
DEFAULT_DEATH_TYPE_CONCEPT_ID = 32817


def persons(patients: DataFrame) -> DataFrame:
    """SourcePatient rows → OMOP Person (person_etl.py:399-445).

    Deterministic deviation: the reference's ``person_id`` is a DB
    autoincrement — unreproducible across retried tasks — so here it is
    the engine-wide id policy (kgnorm/graph.py:_node_id): a sha2 digest
    of 'person|<source_id>'.
    """
    g = F.lower(F.coalesce(F.col("gender"), F.lit("")))
    race_l = F.lower(F.trim(F.col("race")))
    bd = F.col("birth_date")
    return patients.select(
        F.sha2(F.concat_ws("|", F.lit("person"), F.col("source_id")), 256)
        .alias("person_id"),
        F.coalesce(_map_lit(GENDER_CONCEPT_MAP)[g],
                   F.lit(DEFAULT_GENDER_CONCEPT_ID)).cast("long")
        .alias("gender_concept_id"),
        F.coalesce(F.year(bd), F.lit(DEFAULT_BIRTH_YEAR)).alias("year_of_birth"),
        F.month(bd).alias("month_of_birth"),
        F.dayofmonth(bd).alias("day_of_birth"),
        F.coalesce(_map_lit(RACE_CONCEPT_MAP)[race_l],
                   F.lit(DEFAULT_RACE_CONCEPT_ID)).cast("long")
        .alias("race_concept_id"),
        F.coalesce(_map_lit(ETHNICITY_CONCEPT_MAP)[F.lower(F.trim(F.col("ethnicity")))],
                   F.lit(DEFAULT_ETHNICITY_CONCEPT_ID)).cast("long")
        .alias("ethnicity_concept_id"),
        F.substring(F.col("source_id"), 1, 50).alias("person_source_value"),
        F.col("gender").alias("gender_source_value"),
        F.substring(F.col("race"), 1, 50).alias("race_source_value"),
        F.substring(F.col("ethnicity"), 1, 50).alias("ethnicity_source_value"),
    )


def visit_occurrences(visits: DataFrame, persons_dim: DataFrame,
                      infer_end_date: bool = True) -> DataFrame:
    """SourceVisit rows → OMOP Visit_Occurrence (visit_etl.py:241-300):
    enum concept map with outpatient default; missing end date inferred
    from the start when configured (visit_etl.py:131, 232-239)."""
    r = _person_id(visits, persons_dim)
    vt = F.lower(F.coalesce(F.col("visit_type"), F.lit("unknown"))) \
        if "visit_type" in visits.columns else F.lit("unknown")
    concept = F.coalesce(_map_lit(VISIT_CONCEPT_MAP)[vt], F.lit(9202))
    start_date = F.coalesce(F.col("start_datetime").cast("date"), F.current_date())
    end_expr = F.col("end_datetime").cast("date")
    end_date = F.coalesce(end_expr, start_date) if infer_end_date else end_expr
    return r.select(
        F.col("source_id").alias("visit_source_id"),
        "person_id",
        concept.cast("long").alias("visit_concept_id"),
        start_date.alias("visit_start_date"),
        F.col("start_datetime").alias("visit_start_datetime"),
        end_date.alias("visit_end_date"),
        F.col("end_datetime").alias("visit_end_datetime"),
        F.lit(DEFAULT_VISIT_TYPE_CONCEPT_ID).cast("long").alias("visit_type_concept_id"),
        F.substring(vt, 1, 50).alias("visit_source_value"),
    )


def procedure_occurrences(
    procedures: DataFrame,
    concepts: DataFrame,
    relationships: DataFrame,
    persons_dim: DataFrame,
    include_not_done: bool = False,
    default_type_concept_id: int = DEFAULT_PROCEDURE_TYPE_CONCEPT_ID,
) -> DataFrame:
    """SourceProcedure rows → OMOP Procedure_Occurrence
    (procedure_etl.py transform + PROCEDURE_STATUS_MAP gate)."""
    r = _person_id(_lookup_concepts(procedures, concepts, relationships), persons_dim)
    if "status" in procedures.columns and not include_not_done:
        r = r.filter(F.coalesce(F.col("status"), F.lit("unknown")) != "not_done")
    return r.select(
        F.col("source_id").alias("procedure_source_id"),
        "person_id",
        F.col("_concept_id").cast("long").alias("procedure_concept_id"),
        F.coalesce(F.col("performed_datetime").cast("date"), F.current_date())
        .alias("procedure_date"),
        F.col("performed_datetime").alias("procedure_datetime"),
        F.lit(default_type_concept_id).cast("long").alias("procedure_type_concept_id"),
        (F.col("quantity") if "quantity" in procedures.columns else F.lit(1))
        .cast("int").alias("quantity"),
        _source_value(F.col("code"), F.col("code_system")).alias("procedure_source_value"),
        F.col("_source_concept_id").cast("long").alias("procedure_source_concept_id"),
    )


def observations(
    obs: DataFrame,
    concepts: DataFrame,
    relationships: DataFrame,
    persons_dim: DataFrame,
    default_type_concept_id: int = DEFAULT_OBSERVATION_TYPE_CONCEPT_ID,
) -> DataFrame:
    """SourceObservation rows → OMOP Observation (observation_etl.py
    transform): categorical value_text → value_as_concept_id via the
    VALUE_CONCEPT_MAP lookup (lowercased), unit via the shared table."""
    r = _person_id(_lookup_concepts(obs, concepts, relationships), persons_dim)
    vt = F.lower(F.trim(F.col("value_text")))
    return r.select(
        F.col("source_id").alias("observation_source_id"),
        "person_id",
        F.col("_concept_id").cast("long").alias("observation_concept_id"),
        (F.col("effective_datetime").cast("date")
         if "effective_datetime" in obs.columns
         else F.lit(None).cast("date")).alias("observation_date"),
        F.lit(default_type_concept_id).cast("long").alias("observation_type_concept_id"),
        (F.col("value_numeric").cast("double")
         if "value_numeric" in obs.columns
         else F.lit(None).cast("double")).alias("value_as_number"),
        F.col("value_text").alias("value_as_string"),
        _map_lit(VALUE_CONCEPT_MAP)[vt].cast("long").alias("value_as_concept_id"),
        (_unit_concept(F.col("unit")) if "unit" in obs.columns
         else F.lit(None)).cast("long").alias("unit_concept_id"),
        _source_value(F.col("code"), F.col("code_system"))
        .alias("observation_source_value"),
        F.col("_source_concept_id").cast("long").alias("observation_source_concept_id"),
        F.substring(F.col("value_text"), 1, 50).alias("value_source_value"),
    )


def deaths(
    death_rows: DataFrame,
    concepts: DataFrame,
    relationships: DataFrame,
    persons_dim: DataFrame,
    default_type_concept_id: int = DEFAULT_DEATH_TYPE_CONCEPT_ID,
) -> DataFrame:
    """Source death rows (patient_source_id, death_datetime, death_type,
    cause code/code_system) → OMOP Death (death_etl.py transform)."""
    r = _person_id(_lookup_concepts(death_rows, concepts, relationships), persons_dim)
    dt = F.lower(F.trim(F.col("death_type"))) if "death_type" in death_rows.columns \
        else F.lit("ehr")
    return r.select(
        "person_id",
        F.col("death_datetime").cast("date").alias("death_date"),
        F.col("death_datetime").alias("death_datetime"),
        F.coalesce(_map_lit(DEATH_TYPE_CONCEPT_MAP)[dt],
                   F.lit(default_type_concept_id)).cast("long")
        .alias("death_type_concept_id"),
        F.col("_concept_id").cast("long").alias("cause_concept_id"),
        F.when(F.col("code").isNotNull(),
               _source_value(F.col("code"), F.col("code_system")))
        .alias("cause_source_value"),
        F.col("_source_concept_id").cast("long").alias("cause_source_concept_id"),
    )
