"""Database connector mapping layer — behavior pinned against
backend/app/connectors/database_connector.py (everything but the JDBC
wire protocol, which Spark's own reader provides)."""

import datetime

import pytest
from pyspark.sql import functions as F

from kgnorm import dbsource


class TestQueryBuilding:
    def test_build_query(self):
        assert dbsource.build_query("dx") == "SELECT * FROM dx"
        assert dbsource.build_query("dx", "active=1") == \
            "SELECT * FROM dx WHERE active=1"
        assert dbsource.build_query("dx", "active=1", "id") == \
            "SELECT * FROM dx WHERE active=1 ORDER BY id"


class TestMapping:
    def test_conditions_case_insensitive_and_typed(self, spark):
        # uppercase DB column names; onset already a DATE (typed JDBC)
        df = spark.createDataFrame(
            [("DX1", "P1", "E11.9", "Diabetes", "Active",
              datetime.date(2024, 1, 15))],
            "DX_ID string, PAT_ID string, DIAGNOSIS_CODE string,"
            " DX_NAME string, DX_STATUS string, DX_DATE date",
        )
        r = dbsource.db_conditions(df).collect()[0]
        assert r["source_id"] == "DX1"
        assert r["patient_source_id"] == "P1"
        assert r["code"] == "E11.9"
        assert r["display_text"] == "Diabetes"
        assert r["status"] == "active"  # 'Active' lowercased by parser
        assert str(r["onset_datetime"])[:10] == "2024-01-15"
        assert r["code_system"] == "ICD10CM"  # default

    def test_explicit_mapping_wins(self, spark):
        df = spark.createDataFrame(
            [("A", "B")], "weird string, patient_id string")
        r = dbsource.db_conditions(df, custom={"source_id": "weird"}).collect()[0]
        assert r["source_id"] == "A"

    def test_string_vs_typed_numeric(self, spark):
        df = spark.createDataFrame(
            [("L1", "P1", "4548-4", "8.2", 1.5)],
            "result_id string, patient_id string, loinc_code string,"
            " result_value string, normal_low double",
        )
        r = dbsource.db_measurements(df).collect()[0]
        assert r["value_numeric"] == 8.2   # string parsed
        assert r["range_low"] == 1.5        # typed passthrough
        assert r["range_high"] is None      # unresolved column → NULL

    def test_drugs(self, spark):
        df = spark.createDataFrame(
            [("RX1", "P1", "6809", "Metformin", "DISCONTINUED",
              datetime.datetime(2024, 1, 1, 8, 0), "500", "mg")],
            "rx_id string, pat_id string, ndc string, drug_name string,"
            " order_status string, order_date timestamp, dose string,"
            " units string",
        )
        r = dbsource.db_drugs(df).collect()[0]
        assert r["status"] == "stopped"
        assert str(r["start_datetime"]) == "2024-01-01 08:00:00"
        assert r["dose_value"] == 500.0 and r["dose_unit"] == "mg"

    def test_chains_into_etl(self, spark):
        from kgnorm import etl

        df = spark.createDataFrame(
            [("DX9", "P5", "E11.9", "x", "resolved", None)],
            "diagnosis_id string, patient_id string, icd10_code string,"
            " description string, clinical_status string, onset_date timestamp")
        concepts = spark.createDataFrame(
            [(45500001, "T2DM", "E11.9", "ICD10CM"), (201826, "T2DM", "s", "SNOMED")],
            "concept_id long, concept_name string, concept_code string, vocabulary_id string")
        rels = spark.createDataFrame([(45500001, 201826, "Maps to")],
                                     "concept_id_1 long, concept_id_2 long, relationship_id string")
        persons = spark.createDataFrame([("P5", 5)],
                                        "patient_source_id string, person_id long")
        out = etl.condition_occurrences(
            dbsource.db_conditions(df), concepts, rels, persons).collect()[0]
        assert out["person_id"] == 5
        assert out["condition_concept_id"] == 201826
        assert out["condition_status_concept_id"] == 32893
