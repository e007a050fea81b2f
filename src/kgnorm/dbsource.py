"""Database source connector: JDBC tables/queries → typed SourceRecord
DataFrames.

Port of ``backend/app/connectors/database_connector.py``:

* SELECT construction from a TableMapping (table, where, order_by)
  (:504-511);
* column resolution: explicit mapping first, then default synonym
  lists, both CASE-INSENSITIVE against the actual row keys (:513-541);
* default synonym tables per resource (:70-244);
* typed parsing with the same status/gender semantics as the CSV
  connector (the reference shares the enums).

Spark-first: the scan is ``spark.read.jdbc`` with the WHERE clause
pushed into the dbtable subquery and optional partitioned reads
(partitionColumn/lowerBound/upperBound/numPartitions) so a 10^9-row
source table is ingested by N parallel executors, not the reference's
single asyncpg cursor.  Column resolution happens once on the driver
against the JDBC schema; the mapping itself is a plain ``select`` that
works on ANY DataFrame — the tests and driver queries feed it
non-JDBC DataFrames, which exercises everything but the wire protocol.
JDBC values arrive already typed, so each field CASTs when the source
column is non-string and string-parses otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from kgnorm import connectors as _cn

# database_connector.py:70-244
DB_PATIENT_MAPPING = {
    "source_id": ["patient_id", "pat_id", "id", "mrn"],
    "given_name": ["first_name", "given_name", "fname", "first"],
    "family_name": ["last_name", "family_name", "lname", "last", "surname"],
    "birth_date": ["birth_date", "dob", "date_of_birth", "birthdate"],
    "gender": ["gender", "sex", "gender_code"],
    "race": ["race", "race_code"],
    "ethnicity": ["ethnicity", "ethnicity_code", "ethnic_group"],
    "address_line1": ["address", "address_line1", "street", "address1"],
    "city": ["city"],
    "state": ["state", "state_code", "province"],
    "postal_code": ["zip", "postal_code", "zip_code", "zipcode"],
    "phone": ["phone", "phone_number", "telephone"],
    "email": ["email", "email_address"],
    "death_date": ["death_date", "deceased_date", "date_of_death"],
}

DB_CONDITION_MAPPING = {
    "source_id": ["condition_id", "diagnosis_id", "dx_id", "id"],
    "patient_source_id": ["patient_id", "pat_id", "person_id"],
    "visit_source_id": ["visit_id", "encounter_id", "enc_id"],
    "code": ["diagnosis_code", "icd_code", "icd10_code", "code", "dx_code"],
    "code_system": ["code_system", "code_type", "vocabulary"],
    "display_text": ["diagnosis_name", "description", "dx_name", "display"],
    "status": ["status", "clinical_status", "dx_status"],
    "onset_datetime": ["onset_date", "diagnosis_date", "dx_date", "start_date"],
}

DB_DRUG_MAPPING = {
    "source_id": ["medication_id", "med_id", "rx_id", "order_id", "id"],
    "patient_source_id": ["patient_id", "pat_id", "person_id"],
    "visit_source_id": ["visit_id", "encounter_id"],
    "code": ["ndc", "rxnorm_code", "med_code", "drug_code", "code"],
    "code_system": ["code_system", "code_type", "vocabulary"],
    "display_text": ["medication_name", "drug_name", "med_name", "description"],
    "status": ["status", "order_status"],
    "start_datetime": ["start_date", "order_date", "begin_date"],
    "end_datetime": ["end_date", "stop_date", "discontinue_date"],
    "dose_value": ["dose", "dose_value", "strength"],
    "dose_unit": ["dose_unit", "unit", "units"],
    "route": ["route", "route_code"],
    "frequency": ["frequency", "freq", "sig"],
}

DB_MEASUREMENT_MAPPING = {
    "source_id": ["result_id", "lab_id", "measurement_id", "obs_id", "id"],
    "patient_source_id": ["patient_id", "pat_id", "person_id"],
    "visit_source_id": ["visit_id", "encounter_id"],
    "code": ["loinc_code", "loinc", "test_code", "code"],
    "code_system": ["code_system", "code_type"],
    "display_text": ["test_name", "result_name", "description"],
    "value_numeric": ["result_value", "value", "numeric_value", "value_num"],
    "value_text": ["result_text", "value_text", "text_value"],
    "unit": ["unit", "units", "result_unit"],
    "range_low": ["normal_low", "range_low", "reference_low", "low"],
    "range_high": ["normal_high", "range_high", "reference_high", "high"],
    "interpretation": ["abnormal_flag", "interpretation", "flag"],
    "effective_datetime": ["result_date", "collected_date", "obs_date"],
}


def build_query(table_name: str, where_clause: str | None = None,
                order_by: str | None = None) -> str:
    """SELECT construction (database_connector.py:504-511)."""
    q = f"SELECT * FROM {table_name}"
    if where_clause:
        q += f" WHERE {where_clause}"
    if order_by:
        q += f" ORDER BY {order_by}"
    return q


def read_table(
    spark: SparkSession,
    url: str,
    table_name: str,
    where_clause: str | None = None,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    properties: dict | None = None,
) -> DataFrame:
    """Parallel JDBC scan of one mapped table.

    The WHERE clause is pushed into the dbtable subquery (runs in the
    database); partitionColumn splits the scan across executors."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"({build_query(table_name, where_clause)}) src")
    )
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def _resolve(df: DataFrame, field: str, mapping: dict, custom: dict | None):
    """Case-insensitive explicit-then-default resolution
    (database_connector.py:513-541), against the DataFrame schema."""
    name = _cn.resolve_column(df.columns, field, mapping, custom)
    return name


def _typed(df: DataFrame, field: str, mapping: dict, custom, kind: str):
    name = _resolve(df, field, mapping, custom)
    if name is None:
        null_type = {"ts": "timestamp", "date": "date", "double": "double",
                     "int": "int"}.get(kind, "string")
        return F.lit(None).cast(null_type)
    col = F.col(f"`{name}`")
    dtype = dict(df.dtypes)[name]
    is_str = dtype == "string"
    if kind == "str":
        return _cn._nz(col) if is_str else col.cast("string")
    if kind == "ts":
        return _cn.parse_datetime(_cn._nz(col)) if is_str else col.cast("timestamp")
    if kind == "date":
        return _cn.parse_date(_cn._nz(col)) if is_str else col.cast("date")
    if kind in ("double", "int"):
        base = _cn._nz(col).try_cast("double") if is_str else col.cast("double")
        return base.cast("int") if kind == "int" else base
    raise ValueError(kind)


def db_patients(df: DataFrame, source_system: str = "database",
                custom: dict | None = None) -> DataFrame:
    t = lambda f, k="str": _typed(df, f, DB_PATIENT_MAPPING, custom, k)
    return df.select(
        t("source_id").alias("source_id"),
        F.lit(source_system).alias("source_system"),
        t("given_name").alias("given_name"),
        t("family_name").alias("family_name"),
        t("birth_date", "date").alias("birth_date"),
        _cn.parse_gender(t("gender")).alias("gender"),
        t("race").alias("race"),
        t("ethnicity").alias("ethnicity"),
        t("city").alias("city"),
        t("state").alias("state"),
        t("postal_code").alias("postal_code"),
        t("death_date", "date").alias("death_date"),
    ).filter(F.col("source_id").isNotNull())


def db_conditions(df: DataFrame, source_system: str = "database",
                  custom: dict | None = None) -> DataFrame:
    t = lambda f, k="str": _typed(df, f, DB_CONDITION_MAPPING, custom, k)
    return df.select(
        t("source_id").alias("source_id"),
        F.lit(source_system).alias("source_system"),
        t("patient_source_id").alias("patient_source_id"),
        t("visit_source_id").alias("visit_source_id"),
        t("code").alias("code"),
        F.coalesce(t("code_system"), F.lit("ICD10CM")).alias("code_system"),
        t("display_text").alias("display_text"),
        _cn.parse_condition_status(t("status")).alias("status"),
        t("onset_datetime", "ts").alias("onset_datetime"),
    ).filter(F.col("source_id").isNotNull())


def db_drugs(df: DataFrame, source_system: str = "database",
             custom: dict | None = None) -> DataFrame:
    t = lambda f, k="str": _typed(df, f, DB_DRUG_MAPPING, custom, k)
    return df.select(
        t("source_id").alias("source_id"),
        F.lit(source_system).alias("source_system"),
        t("patient_source_id").alias("patient_source_id"),
        t("code").alias("code"),
        F.coalesce(t("code_system"), F.lit("RxNorm")).alias("code_system"),
        t("display_text").alias("display_text"),
        _cn.parse_drug_status(t("status")).alias("status"),
        t("start_datetime", "ts").alias("start_datetime"),
        t("end_datetime", "ts").alias("end_datetime"),
        t("dose_value", "double").alias("dose_value"),
        t("dose_unit").alias("dose_unit"),
        t("route").alias("route"),
        t("frequency").alias("frequency"),
    ).filter(F.col("source_id").isNotNull())


def db_measurements(df: DataFrame, source_system: str = "database",
                    custom: dict | None = None) -> DataFrame:
    t = lambda f, k="str": _typed(df, f, DB_MEASUREMENT_MAPPING, custom, k)
    return df.select(
        t("source_id").alias("source_id"),
        F.lit(source_system).alias("source_system"),
        t("patient_source_id").alias("patient_source_id"),
        t("code").alias("code"),
        F.coalesce(t("code_system"), F.lit("LOINC")).alias("code_system"),
        t("display_text").alias("display_text"),
        t("value_numeric", "double").alias("value_numeric"),
        t("value_text").alias("value_text"),
        t("unit").alias("unit"),
        t("range_low", "double").alias("range_low"),
        t("range_high", "double").alias("range_high"),
        t("interpretation").alias("interpretation"),
        t("effective_datetime", "ts").alias("effective_datetime"),
    ).filter(F.col("source_id").isNotNull())
