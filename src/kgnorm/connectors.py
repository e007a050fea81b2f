"""Structured-source connectors: CSV and FHIR NDJSON → typed SourceRecord
DataFrames.

Port of ``backend/app/connectors/base.py`` (SourceRecord models, :90-380),
``csv_connector.py`` (column-synonym resolution :261-289, typed parsers
:297-393, per-resource extractors :412-753) and ``fhir_connector.py``
(CodeableConcept extraction :258-280, system URL normalization :282-298,
resource parsers :300-610).

Spark-first design:

* ``spark.read.csv`` / a single ``spark.read.text`` scan — the format
  readers are the connector; there is no per-row Python.
* Column-synonym resolution happens ONCE on the driver against the
  DataFrame schema (the reference resolves per file too,
  csv_connector.py:419-421); the executors only see a resolved
  ``select``.
* Typed parsing (multi-format dates, status enums, gender) is a
  ``coalesce`` of ``try_to_date``/``try_to_timestamp`` and CASE chains —
  all inside whole-stage codegen, so a 100-TB CSV lake parses without
  leaving the JVM.
* FHIR NDJSON is read as text and decoded with ``from_json`` against an
  EXPLICIT per-resource-type schema (filtered first on a cheap
  ``get_json_object`` resourceType probe): no schema inference pass over
  the lake, and unrelated resource fields are never materialized.

Empty-string handling mirrors ``_get_value`` (csv_connector.py:291-296):
values are trimmed and '' becomes NULL before any parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# column-synonym tables (csv_connector.py:107-186, 466-473)
# ---------------------------------------------------------------------------

PATIENT_COLUMNS = {
    "source_id": ["patient_id", "id", "mrn", "patientid"],
    "given_name": ["first_name", "given_name", "firstname", "given"],
    "family_name": ["last_name", "family_name", "lastname", "family", "surname"],
    "birth_date": ["dob", "birth_date", "birthdate", "date_of_birth"],
    "gender": ["sex", "gender"],
    "race": ["race"],
    "ethnicity": ["ethnicity"],
    "mrn": ["mrn", "medical_record_number"],
    "address_line1": ["address", "address1", "street"],
    "city": ["city"],
    "state": ["state", "province"],
    "postal_code": ["zip", "postal_code", "zipcode"],
    "phone": ["phone", "telephone"],
    "email": ["email"],
    "deceased": ["deceased", "is_deceased"],
    "death_date": ["death_date", "date_of_death"],
}

CONDITION_COLUMNS = {
    "source_id": ["condition_id", "diagnosis_id", "id"],
    "patient_source_id": ["patient_id", "patientid"],
    "visit_source_id": ["visit_id", "encounter_id"],
    "code": ["icd_code", "code", "diagnosis_code", "icd10"],
    "code_system": ["code_system", "vocabulary"],
    "display_text": ["description", "display", "diagnosis_name", "condition_name"],
    "status": ["status", "clinical_status"],
    "onset_datetime": ["onset_date", "diagnosis_date", "start_date"],
    "category": ["category", "type"],
}

DRUG_COLUMNS = {
    "source_id": ["medication_id", "drug_id", "id", "rx_id"],
    "patient_source_id": ["patient_id", "patientid"],
    "visit_source_id": ["visit_id", "encounter_id"],
    "code": ["ndc", "rxnorm", "code", "drug_code"],
    "code_system": ["code_system", "vocabulary"],
    "display_text": ["drug_name", "medication_name", "name", "description"],
    "status": ["status"],
    "start_datetime": ["start_date", "order_date", "prescribed_date"],
    "end_datetime": ["end_date", "stop_date"],
    "dose_value": ["dose", "dose_value", "strength"],
    "dose_unit": ["dose_unit", "unit"],
    "route": ["route", "route_of_admin"],
    "frequency": ["frequency", "sig"],
    "quantity": ["quantity", "qty"],
    "days_supply": ["days_supply", "supply_days"],
}

PROCEDURE_COLUMNS = {
    "source_id": ["procedure_id", "id"],
    "patient_source_id": ["patient_id", "patientid"],
    "visit_source_id": ["visit_id", "encounter_id"],
    "code": ["cpt_code", "procedure_code", "code", "icd10pcs"],
    "code_system": ["code_system", "vocabulary"],
    "display_text": ["procedure_name", "description", "name"],
    "status": ["status"],
    "performed_datetime": ["procedure_date", "performed_date", "date"],
}

MEASUREMENT_COLUMNS = {
    "source_id": ["measurement_id", "lab_id", "result_id", "id"],
    "patient_source_id": ["patient_id", "patientid"],
    "visit_source_id": ["visit_id", "encounter_id"],
    "code": ["loinc", "code", "test_code"],
    "code_system": ["code_system", "vocabulary"],
    "display_text": ["test_name", "name", "description"],
    "value_numeric": ["value", "result", "numeric_value"],
    "value_text": ["text_value", "value_text"],
    "unit": ["unit", "units"],
    "range_low": ["reference_low", "normal_low", "range_low"],
    "range_high": ["reference_high", "normal_high", "range_high"],
    "interpretation": ["interpretation", "flag", "abnormal_flag"],
    "effective_datetime": ["result_date", "collection_date", "date"],
}

VISIT_COLUMNS = {  # csv_connector.py:466-473
    "source_id": ["visit_id", "encounter_id", "id"],
    "patient_source_id": ["patient_id", "patientid"],
    "visit_type": ["visit_type", "encounter_type", "type"],
    "start_datetime": ["admission_date", "start_date", "visit_date"],
    "end_datetime": ["discharge_date", "end_date"],
    "facility_name": ["facility", "hospital", "clinic"],
}

# fallback date formats, tried in order (csv_connector.py:303-310)
DATE_FORMATS = ["yyyy-MM-dd", "M/d/yyyy", "d/M/yyyy", "yyyyMMdd"]
# (csv_connector.py:317-331)
DATETIME_FORMATS = [
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
    "M/d/yyyy HH:mm",
    "yyyy-MM-dd",
]


def resolve_column(
    headers: list[str],
    field_name: str,
    default_mappings: dict[str, list[str]],
    custom: dict[str, str] | None = None,
) -> str | None:
    """Find the actual column for a logical field (csv_connector.py:261-289).

    Custom mapping first, then the default synonym list in order,
    case-insensitively against the actual header.
    """
    lower = [h.lower().strip() for h in headers]
    if custom and field_name in custom:
        m = custom[field_name].lower()
        if m in lower:
            return headers[lower.index(m)]
    for name in default_mappings.get(field_name, [field_name]):
        if name.lower() in lower:
            return headers[lower.index(name.lower())]
    return None


# ---------------------------------------------------------------------------
# typed parsing expressions (all JVM-side)
# ---------------------------------------------------------------------------


def _nz(col):
    """trim, '' → NULL (csv_connector.py:291-296)."""
    t = F.trim(col)
    return F.when(F.length(t) > 0, t)


def parse_date(col):
    """Multi-format date parse, first format that succeeds wins."""
    return F.coalesce(*[F.try_to_date(col, f) for f in DATE_FORMATS])


def parse_datetime(col):
    return F.coalesce(*[F.try_to_timestamp(col, F.lit(f)) for f in DATETIME_FORMATS])


def parse_bool(col):
    """(csv_connector.py:352-357): true/1/yes/y/t; missing → false."""
    return F.coalesce(
        F.lower(col).isin("true", "1", "yes", "y", "t"), F.lit(False)
    )


def parse_gender(col):
    """(csv_connector.py:359-371)."""
    v = F.lower(F.trim(col))
    return (
        F.when(v.isin("m", "male", "man"), "male")
        .when(v.isin("f", "female", "woman"), "female")
        .when(v.isin("o", "other"), "other")
        .otherwise("unknown")
    )


def parse_condition_status(col):
    """(csv_connector.py:373-384)."""
    v = F.lower(F.trim(col))
    return (
        F.when(v.isin("active", "current"), "active")
        .when(v.isin("inactive", "remission"), "inactive")
        .when(v.isin("resolved", "completed"), "resolved")
        .otherwise("unknown")
    )


def parse_drug_status(col):
    """(csv_connector.py:386-397)."""
    v = F.lower(F.trim(col))
    return (
        F.when(v.isin("active", "current"), "active")
        .when(v.isin("completed", "finished"), "completed")
        .when(v.isin("stopped", "discontinued"), "stopped")
        .otherwise("unknown")
    )


# ---------------------------------------------------------------------------
# CSV connector
# ---------------------------------------------------------------------------


def read_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    encoding: str = "utf-8",
) -> DataFrame:
    """Raw CSV scan (header row, all columns as string — parsing is the
    connector's job, so malformed cells degrade to NULL per-field instead
    of killing the record, mirroring skip_on_error)."""
    return (
        spark.read.option("header", True)
        .option("sep", delimiter)
        .option("encoding", encoding)
        .csv(path)
    )


def _col_or_null(df: DataFrame, logical: str, mapping: dict, custom=None):
    actual = resolve_column(df.columns, logical, mapping, custom)
    return _nz(F.col(f"`{actual}`")) if actual is not None else F.lit(None).cast("string")


def csv_patients(df: DataFrame, source_system: str = "csv", custom=None) -> DataFrame:
    """CSV rows → SourcePatient records (csv_connector.py:412-459).

    Rows without a source_id are dropped, as in the reference (:456-457).
    """
    c = lambda f: _col_or_null(df, f, PATIENT_COLUMNS, custom)
    return df.select(
        c("source_id").alias("source_id"),
        F.lit(source_system).alias("source_system"),
        c("given_name").alias("given_name"),
        c("family_name").alias("family_name"),
        parse_date(c("birth_date")).alias("birth_date"),
        parse_gender(c("gender")).alias("gender"),
        c("race").alias("race"),
        c("ethnicity").alias("ethnicity"),
        c("mrn").alias("mrn"),
        c("address_line1").alias("address_line1"),
        c("city").alias("city"),
        c("state").alias("state"),
        c("postal_code").alias("postal_code"),
        c("phone").alias("phone"),
        c("email").alias("email"),
        parse_bool(c("deceased")).alias("deceased"),
        parse_date(c("death_date")).alias("death_date"),
    ).filter(F.col("source_id").isNotNull())


def csv_conditions(df: DataFrame, source_system: str = "csv", custom=None) -> DataFrame:
    """CSV rows → SourceCondition records (csv_connector.py:525-575)."""
    c = lambda f: _col_or_null(df, f, CONDITION_COLUMNS, custom)
    return df.select(
        c("source_id").alias("source_id"),
        F.lit(source_system).alias("source_system"),
        c("patient_source_id").alias("patient_source_id"),
        c("visit_source_id").alias("visit_source_id"),
        c("code").alias("code"),
        # missing system defaults per resource type (csv_connector.py:535)
        F.coalesce(c("code_system"), F.lit("ICD10CM")).alias("code_system"),
        c("display_text").alias("display_text"),
        parse_condition_status(c("status")).alias("status"),
        parse_datetime(c("onset_datetime")).alias("onset_datetime"),
        c("category").alias("category"),
    ).filter(F.col("source_id").isNotNull())


def csv_drugs(df: DataFrame, source_system: str = "csv", custom=None) -> DataFrame:
    """CSV rows → SourceDrug records (csv_connector.py:577-640)."""
    c = lambda f: _col_or_null(df, f, DRUG_COLUMNS, custom)
    return df.select(
        c("source_id").alias("source_id"),
        F.lit(source_system).alias("source_system"),
        c("patient_source_id").alias("patient_source_id"),
        c("visit_source_id").alias("visit_source_id"),
        c("code").alias("code"),
        F.coalesce(c("code_system"), F.lit("RxNorm")).alias("code_system"),  # :580
        c("display_text").alias("display_text"),
        parse_drug_status(c("status")).alias("status"),
        parse_datetime(c("start_datetime")).alias("start_datetime"),
        parse_datetime(c("end_datetime")).alias("end_datetime"),
        (c("dose_value")).try_cast("double").alias("dose_value"),
        c("dose_unit").alias("dose_unit"),
        c("route").alias("route"),
        c("frequency").alias("frequency"),
        (c("quantity")).try_cast("double").alias("quantity"),
        # reference parses int via int(float(v)) (csv_connector.py:343-350)
        (c("days_supply")).try_cast("double").cast("int").alias("days_supply"),
    ).filter(F.col("source_id").isNotNull())


def csv_measurements(df: DataFrame, source_system: str = "csv", custom=None) -> DataFrame:
    """CSV rows → SourceMeasurement records (csv_connector.py:642-705)."""
    c = lambda f: _col_or_null(df, f, MEASUREMENT_COLUMNS, custom)
    return df.select(
        c("source_id").alias("source_id"),
        F.lit(source_system).alias("source_system"),
        c("patient_source_id").alias("patient_source_id"),
        c("visit_source_id").alias("visit_source_id"),
        c("code").alias("code"),
        F.coalesce(c("code_system"), F.lit("LOINC")).alias("code_system"),  # :672
        c("display_text").alias("display_text"),
        (c("value_numeric")).try_cast("double").alias("value_numeric"),
        c("value_text").alias("value_text"),
        c("unit").alias("unit"),
        (c("range_low")).try_cast("double").alias("range_low"),
        (c("range_high")).try_cast("double").alias("range_high"),
        c("interpretation").alias("interpretation"),
        parse_datetime(c("effective_datetime")).alias("effective_datetime"),
    ).filter(F.col("source_id").isNotNull())


def csv_visits(df: DataFrame, source_system: str = "csv", custom=None) -> DataFrame:
    """CSV rows → SourceVisit records (csv_connector.py:461-523)."""
    c = lambda f: _col_or_null(df, f, VISIT_COLUMNS, custom)
    return df.select(
        c("source_id").alias("source_id"),
        F.lit(source_system).alias("source_system"),
        c("patient_source_id").alias("patient_source_id"),
        parse_datetime(c("start_datetime")).alias("start_datetime"),
        parse_datetime(c("end_datetime")).alias("end_datetime"),
        c("facility_name").alias("facility_name"),
    ).filter(F.col("source_id").isNotNull())


def csv_procedures(df: DataFrame, source_system: str = "csv", custom=None) -> DataFrame:
    """CSV rows → SourceProcedure records (csv_connector.py:707-753)."""
    c = lambda f: _col_or_null(df, f, PROCEDURE_COLUMNS, custom)
    return df.select(
        c("source_id").alias("source_id"),
        F.lit(source_system).alias("source_system"),
        c("patient_source_id").alias("patient_source_id"),
        c("visit_source_id").alias("visit_source_id"),
        c("code").alias("code"),
        F.coalesce(c("code_system"), F.lit("CPT4")).alias("code_system"),  # :631
        c("display_text").alias("display_text"),
        parse_datetime(c("performed_datetime")).alias("performed_datetime"),
    ).filter(F.col("source_id").isNotNull())


# ---------------------------------------------------------------------------
# FHIR NDJSON connector
# ---------------------------------------------------------------------------

# fhir_connector.py:282-298
FHIR_SYSTEM_MAP = {
    "http://snomed.info/sct": "SNOMED",
    "http://hl7.org/fhir/sid/icd-10": "ICD10",
    "http://hl7.org/fhir/sid/icd-10-cm": "ICD10CM",
    "http://hl7.org/fhir/sid/icd-9-cm": "ICD9CM",
    "http://www.ama-assn.org/go/cpt": "CPT4",
    "http://www.nlm.nih.gov/research/umls/rxnorm": "RxNorm",
    "http://loinc.org": "LOINC",
    "http://hl7.org/fhir/sid/ndc": "NDC",
}

_CODING = T.ArrayType(T.StructType([
    T.StructField("system", T.StringType()),
    T.StructField("code", T.StringType()),
    T.StructField("display", T.StringType()),
]))
_CODEABLE = T.StructType([
    T.StructField("coding", _CODING),
    T.StructField("text", T.StringType()),
])
_REFERENCE = T.StructType([T.StructField("reference", T.StringType()),
                           T.StructField("display", T.StringType())])
_PERIOD = T.StructType([T.StructField("start", T.StringType()),
                        T.StructField("end", T.StringType())])

PATIENT_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("name", T.ArrayType(T.StructType([
        T.StructField("given", T.ArrayType(T.StringType())),
        T.StructField("family", T.StringType()),
    ]))),
    T.StructField("birthDate", T.StringType()),
    T.StructField("gender", T.StringType()),
    T.StructField("address", T.ArrayType(T.StructType([
        T.StructField("line", T.ArrayType(T.StringType())),
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("postalCode", T.StringType()),
        T.StructField("country", T.StringType()),
    ]))),
    T.StructField("identifier", T.ArrayType(T.StructType([
        T.StructField("type", _CODEABLE),
        T.StructField("value", T.StringType()),
    ]))),
])

CONDITION_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("code", _CODEABLE),
    T.StructField("onsetDateTime", T.StringType()),
    T.StructField("onsetPeriod", _PERIOD),
    T.StructField("abatementDateTime", T.StringType()),
    T.StructField("abatementPeriod", _PERIOD),
    T.StructField("clinicalStatus", _CODEABLE),
    T.StructField("subject", _REFERENCE),
])

MEDICATION_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("medicationCodeableConcept", _CODEABLE),
    T.StructField("medicationReference", _REFERENCE),
    T.StructField("authoredOn", T.StringType()),
    T.StructField("effectivePeriod", _PERIOD),
    T.StructField("effectiveDateTime", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("subject", _REFERENCE),
    T.StructField("dosageInstruction", T.ArrayType(T.StructType([
        T.StructField("text", T.StringType()),
        T.StructField("route", _CODEABLE),
        T.StructField("doseAndRate", T.ArrayType(T.StructType([
            T.StructField("doseQuantity", T.StructType([
                T.StructField("value", T.DoubleType()),
                T.StructField("unit", T.StringType()),
            ])),
        ]))),
    ]))),
])

OBSERVATION_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("code", _CODEABLE),
    T.StructField("valueQuantity", T.StructType([
        T.StructField("value", T.DoubleType()),
        T.StructField("unit", T.StringType()),
    ])),
    T.StructField("valueString", T.StringType()),
    T.StructField("referenceRange", T.ArrayType(T.StructType([
        T.StructField("low", T.StructType([T.StructField("value", T.DoubleType())])),
        T.StructField("high", T.StructType([T.StructField("value", T.DoubleType())])),
    ]))),
    T.StructField("interpretation", T.ArrayType(_CODEABLE)),
    T.StructField("effectiveDateTime", T.StringType()),
    T.StructField("subject", _REFERENCE),
])

# fhir_connector.py:214-243 — FHIR instant/dateTime/date parsing
_FHIR_TS_FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd",
]


def _fhir_ts(col):
    return F.coalesce(*[F.try_to_timestamp(col, F.lit(f)) for f in _FHIR_TS_FORMATS])


def read_fhir_ndjson(spark: SparkSession, path: str, resource_type: str,
                     schema: T.StructType) -> DataFrame:
    """One text scan, resourceType probe, typed decode.

    ``get_json_object`` on the raw line is far cheaper than decoding the
    union-of-all-resources schema; only matching lines hit ``from_json``.
    """
    lines = spark.read.text(path)
    matched = lines.filter(
        F.get_json_object(F.col("value"), "$.resourceType") == resource_type
    )
    return matched.select(F.from_json("value", schema).alias("r"))


def _coding_fields(codeable):
    """(code, vocab, display) from a CodeableConcept — first coding wins,
    display falls back to .text (fhir_connector.py:258-280)."""
    first = codeable["coding"][0]
    vocab_map = F.create_map(*[F.lit(x) for kv in FHIR_SYSTEM_MAP.items() for x in kv])
    vocab = F.coalesce(vocab_map[first["system"]], first["system"])
    code = first["code"]
    display = F.coalesce(first["display"], codeable["text"])
    # no codings at all → text only (:280)
    has = codeable["coding"].isNotNull() & (F.size(codeable["coding"]) > 0)
    return (
        F.when(has, code),
        F.when(has, vocab),
        F.when(has, display).otherwise(codeable["text"]),
    )


def _ref_id(ref_col):
    """'Patient/123' → '123' (fhir_connector.py _extract_reference_id)."""
    return F.when(ref_col.isNotNull(), F.element_at(F.split(ref_col, "/"), -1))


def fhir_conditions(spark: SparkSession, path: str,
                    source_system: str = "fhir") -> DataFrame:
    """FHIR Condition resources → SourceCondition (fhir_connector.py:403-463).

    Status default is UNKNOWN when the clinicalStatus code is missing or
    unrecognized — the reference initializes ACTIVE but immediately
    overwrites it with ``status_map.get(code, UNKNOWN)`` (:437-445).
    """
    r = read_fhir_ndjson(spark, path, "Condition", CONDITION_SCHEMA).select("r.*")
    code, vocab, display = _coding_fields(F.col("code"))
    status_code = F.lower(F.coalesce(F.col("clinicalStatus")["coding"][0]["code"], F.lit("")))
    status = (
        F.when(status_code == "active", "active")
        .when(status_code == "inactive", "inactive")
        .when(status_code.isin("resolved", "remission"), "resolved")
        .otherwise("unknown")
    )
    return r.select(
        F.coalesce(F.col("id"), F.lit("")).alias("source_id"),
        F.lit(source_system).alias("source_system"),
        F.coalesce(_ref_id(F.col("subject")["reference"]), F.lit("")).alias("patient_source_id"),
        code.alias("code"),
        vocab.alias("code_system"),
        display.alias("display_text"),
        status.alias("status"),
        _fhir_ts(F.coalesce(F.col("onsetDateTime"), F.col("onsetPeriod")["start"]))
        .alias("onset_datetime"),
        _fhir_ts(F.coalesce(F.col("abatementDateTime"), F.col("abatementPeriod")["end"]))
        .alias("abatement_datetime"),
    )


def fhir_drugs(spark: SparkSession, path: str, source_system: str = "fhir",
               resource_type: str = "MedicationRequest") -> DataFrame:
    """FHIR MedicationRequest/MedicationStatement → SourceDrug
    (fhir_connector.py:465-610)."""
    r = read_fhir_ndjson(spark, path, resource_type, MEDICATION_SCHEMA).select("r.*")
    # medicationCodeableConcept, else the reference display-only fallback (:506-511)
    codeable = F.coalesce(
        F.col("medicationCodeableConcept"),
        F.when(
            F.col("medicationReference")["display"].isNotNull(),
            F.struct(
                F.lit(None).cast(_CODING).alias("coding"),
                F.col("medicationReference")["display"].alias("text"),
            ),
        ),
    )
    code, vocab, display = _coding_fields(codeable)
    status_code = F.lower(F.coalesce(F.col("status"), F.lit("")))
    status = (
        F.when(status_code == "active", "active")
        .when(status_code == "completed", "completed")
        .when(status_code.isin("stopped", "cancelled", "entered-in-error"), "stopped")
        .otherwise("unknown")
    )
    dosage = F.col("dosageInstruction")[0]
    dose_qty = dosage["doseAndRate"][0]["doseQuantity"]
    start = F.coalesce(
        _fhir_ts(F.coalesce(F.col("effectivePeriod")["start"], F.col("effectiveDateTime"))),
        _fhir_ts(F.col("authoredOn")),
    )
    return r.select(
        F.coalesce(F.col("id"), F.lit("")).alias("source_id"),
        F.lit(source_system).alias("source_system"),
        F.coalesce(_ref_id(F.col("subject")["reference"]), F.lit("")).alias("patient_source_id"),
        code.alias("code"),
        vocab.alias("code_system"),
        display.alias("display_text"),
        status.alias("status"),
        start.alias("start_datetime"),
        _fhir_ts(F.col("effectivePeriod")["end"]).alias("end_datetime"),
        dose_qty["value"].alias("dose_value"),
        dose_qty["unit"].alias("dose_unit"),
        F.coalesce(dosage["route"]["coding"][0]["display"],
                   dosage["route"]["text"]).alias("route"),
        dosage["text"].alias("sig"),
    )


def fhir_measurements(spark: SparkSession, path: str,
                      source_system: str = "fhir") -> DataFrame:
    """FHIR Observation resources → SourceMeasurement
    (fhir_connector.py Observation parser)."""
    r = read_fhir_ndjson(spark, path, "Observation", OBSERVATION_SCHEMA).select("r.*")
    code, vocab, display = _coding_fields(F.col("code"))
    rng = F.col("referenceRange")[0]
    return r.select(
        F.coalesce(F.col("id"), F.lit("")).alias("source_id"),
        F.lit(source_system).alias("source_system"),
        F.coalesce(_ref_id(F.col("subject")["reference"]), F.lit("")).alias("patient_source_id"),
        code.alias("code"),
        vocab.alias("code_system"),
        display.alias("display_text"),
        F.col("valueQuantity")["value"].alias("value_numeric"),
        F.col("valueString").alias("value_text"),
        F.col("valueQuantity")["unit"].alias("unit"),
        rng["low"]["value"].alias("range_low"),
        rng["high"]["value"].alias("range_high"),
        F.col("interpretation")[0]["coding"][0]["code"].alias("interpretation"),
        _fhir_ts(F.col("effectiveDateTime")).alias("effective_datetime"),
    )


def fhir_patients(spark: SparkSession, path: str,
                  source_system: str = "fhir") -> DataFrame:
    """FHIR Patient resources → SourcePatient (fhir_connector.py:300-347)."""
    r = read_fhir_ndjson(spark, path, "Patient", PATIENT_SCHEMA).select("r.*")
    name0 = F.col("name")[0]
    addr0 = F.col("address")[0]
    mrn = F.filter(
        F.col("identifier"),
        lambda i: i["type"]["coding"][0]["code"] == F.lit("MR"),
    )[0]["value"]
    gender = F.lower(F.coalesce(F.col("gender"), F.lit("")))
    return r.select(
        F.coalesce(F.col("id"), F.lit("")).alias("source_id"),
        F.lit(source_system).alias("source_system"),
        F.array_join(name0["given"], " ").alias("given_name"),
        name0["family"].alias("family_name"),
        F.try_to_date(F.col("birthDate"), "yyyy-MM-dd").alias("birth_date"),
        F.when(gender.isin("male", "female", "other"), gender)
        .otherwise("unknown").alias("gender"),
        F.array_join(addr0["line"], " ").alias("address_line1"),
        addr0["city"].alias("city"),
        addr0["state"].alias("state"),
        addr0["postalCode"].alias("postal_code"),
        addr0["country"].alias("country"),
        mrn.alias("mrn"),
    )
