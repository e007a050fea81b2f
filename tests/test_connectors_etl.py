"""Structured-source connectors + per-domain OMOP ETL.

Behavior pinned against backend/app/connectors/csv_connector.py,
fhir_connector.py and backend/app/etl/{condition,drug,measurement}_etl.py.
"""

import json
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def csv_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("srcdata")
    # synonym headers on purpose: diagnosis_id/patientid/icd_code/description
    (d / "conditions.csv").write_text(
        "diagnosis_id,patientid,icd_code,description,clinical_status,onset_date,vocabulary\n"
        "DX1,P1,E11.9,Type 2 diabetes mellitus,active,2024-01-15,ICD10CM\n"
        "DX2,P2,I10,Essential hypertension,resolved,1/15/2024,icd10\n"
        "DX3,P1,I50.9,Heart failure,remission,20240115,ICD10CM\n"
        "DX4,P3,XXX,Unknown thing,bogus,,ICD10CM\n"
        ",P9,E11.9,no id row,active,2024-01-01,ICD10CM\n"
    )
    (d / "meds.csv").write_text(
        "rx_id,patient_id,drug_name,code,status,start_date,end_date,dose,unit,route,qty,days_supply\n"
        "RX1,P1,Metformin,6809,active,2024-01-01 08:30:00,2024-01-31 08:30:00,500 mg,mg,oral,60,30\n"
        "RX2,P2,Lisinopril,29046,discontinued,2024-02-01,,10,mg,PO,30,30.0\n"
        "RX3,P1,Aspirin,1191,finished,,,81,mg,unknown-route,,notanint\n"
    )
    (d / "labs.csv").write_text(
        "lab_id,patient_id,loinc,test_name,value,text_value,unit,reference_low,reference_high,flag,result_date\n"
        "L1,P1,4548-4,Hemoglobin A1c,8.2,,%,4.0,5.6,H,2024-03-01 07:00:00\n"
        "L2,P2,2160-0,Creatinine,,<0.2,mg/dL,0.6,1.2,L,2024-03-02\n"
        "L3,P1,2823-3,Potassium,5.9,<=6.1,MMHG,3.5,5.0,H,2024-03-03\n"
    )
    return str(d)


@pytest.fixture(scope="module")
def fhir_path(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fhirdata")
    resources = [
        {"resourceType": "Condition", "id": "c1",
         "code": {"coding": [{"system": "http://hl7.org/fhir/sid/icd-10-cm",
                              "code": "E11.9", "display": "Type 2 diabetes mellitus"}]},
         "onsetDateTime": "2024-01-15T10:30:00",
         "clinicalStatus": {"coding": [{"code": "active"}]},
         "subject": {"reference": "Patient/P1"}},
        {"resourceType": "Condition", "id": "c2",
         "code": {"text": "free text only"},
         "onsetPeriod": {"start": "2024-02-01"},
         "clinicalStatus": {"coding": [{"code": "remission"}]},
         "subject": {"reference": "Patient/P2"}},
        {"resourceType": "Condition", "id": "c3",
         "code": {"coding": [{"system": "http://snomed.info/sct", "code": "44054006"}],
                  "text": "dm2"},
         "subject": {"reference": "Patient/P1"}},
        {"resourceType": "MedicationRequest", "id": "m1",
         "medicationCodeableConcept": {"coding": [
             {"system": "http://www.nlm.nih.gov/research/umls/rxnorm",
              "code": "6809", "display": "Metformin"}]},
         "status": "active", "authoredOn": "2024-01-01",
         "subject": {"reference": "Patient/P1"},
         "dosageInstruction": [{"text": "500 mg PO BID",
                                "route": {"coding": [{"display": "Oral"}]},
                                "doseAndRate": [{"doseQuantity": {"value": 500.0,
                                                                  "unit": "mg"}}]}]},
        {"resourceType": "MedicationRequest", "id": "m2",
         "medicationReference": {"display": "Aspirin 81mg"},
         "status": "cancelled",
         "effectivePeriod": {"start": "2024-02-01T00:00:00", "end": "2024-03-01T00:00:00"},
         "subject": {"reference": "Patient/P2"}},
        {"resourceType": "Observation", "id": "o1",
         "code": {"coding": [{"system": "http://loinc.org", "code": "4548-4",
                              "display": "Hemoglobin A1c"}]},
         "valueQuantity": {"value": 8.2, "unit": "%"},
         "referenceRange": [{"low": {"value": 4.0}, "high": {"value": 5.6}}],
         "interpretation": [{"coding": [{"code": "H"}]}],
         "effectiveDateTime": "2024-03-01T07:00:00",
         "subject": {"reference": "Patient/P1"}},
        {"resourceType": "Patient", "id": "P1",
         "name": [{"given": ["Jane", "Q"], "family": "Doe"}],
         "birthDate": "1960-05-01", "gender": "female",
         "address": [{"line": ["1 Main St"], "city": "Springfield", "state": "IL",
                      "postalCode": "62704"}],
         "identifier": [{"type": {"coding": [{"code": "MR"}]}, "value": "MRN-1"}]},
    ]
    p = d / "bundle.ndjson"
    p.write_text("\n".join(json.dumps(r) for r in resources) + "\n")
    return str(p)


# ---------------------------------------------------------------------------
# CSV connector
# ---------------------------------------------------------------------------


class TestCSVConnector:
    def test_condition_column_synonyms_and_parsing(self, spark, csv_dir):
        from kgnorm import connectors as cn

        df = cn.csv_conditions(cn.read_csv(spark, os.path.join(csv_dir, "conditions.csv")))
        rows = {r["source_id"]: r for r in df.collect()}
        # no-source_id row dropped (csv_connector.py:456-457)
        assert set(rows) == {"DX1", "DX2", "DX3", "DX4"}
        assert rows["DX1"]["patient_source_id"] == "P1"
        assert rows["DX1"]["code"] == "E11.9"
        assert rows["DX1"]["display_text"] == "Type 2 diabetes mellitus"
        assert rows["DX1"]["status"] == "active"
        assert str(rows["DX1"]["onset_datetime"]) == "2024-01-15 00:00:00"
        # onset goes through _parse_datetime (csv_connector.py:540-542),
        # whose fallback list has NO date-only M/d/yyyy or yyyyMMdd
        # (:317-331) — those rows stay NULL, like the reference
        assert rows["DX2"]["onset_datetime"] is None
        assert rows["DX2"]["status"] == "resolved"
        assert rows["DX3"]["onset_datetime"] is None
        assert rows["DX3"]["status"] == "inactive"  # remission → inactive
        assert rows["DX4"]["status"] == "unknown"
        assert rows["DX4"]["onset_datetime"] is None

    def test_drug_typed_fields(self, spark, csv_dir):
        from kgnorm import connectors as cn

        df = cn.csv_drugs(cn.read_csv(spark, os.path.join(csv_dir, "meds.csv")))
        rows = {r["source_id"]: r for r in df.collect()}
        assert rows["RX1"]["display_text"] == "Metformin"
        assert rows["RX1"]["status"] == "active"
        assert str(rows["RX1"]["start_datetime"]) == "2024-01-01 08:30:00"
        assert rows["RX1"]["quantity"] == 60.0
        assert rows["RX1"]["days_supply"] == 30
        assert rows["RX2"]["status"] == "stopped"
        # int parse goes through float (csv_connector.py:343-350)
        assert rows["RX2"]["days_supply"] == 30
        assert rows["RX3"]["status"] == "completed"  # finished → completed
        assert rows["RX3"]["days_supply"] is None
        # "500 mg" is not a bare float → dose_value NULL like the
        # reference's _parse_float (csv_connector.py:334-341)
        assert rows["RX1"]["dose_value"] is None
        assert rows["RX2"]["dose_value"] == 10.0

    def test_measurement_fields(self, spark, csv_dir):
        from kgnorm import connectors as cn

        df = cn.csv_measurements(cn.read_csv(spark, os.path.join(csv_dir, "labs.csv")))
        rows = {r["source_id"]: r for r in df.collect()}
        assert rows["L1"]["value_numeric"] == 8.2
        assert rows["L1"]["unit"] == "%"
        assert rows["L1"]["range_low"] == 4.0
        assert rows["L1"]["range_high"] == 5.6
        assert rows["L1"]["interpretation"] == "H"
        assert rows["L2"]["value_numeric"] is None
        assert rows["L2"]["value_text"] == "<0.2"

    def test_custom_column_mapping_wins(self, spark, tmp_path):
        from kgnorm import connectors as cn

        p = tmp_path / "c.csv"
        p.write_text("weird_id,patient_id,code\nA1,P1,E11.9\n")
        df = cn.csv_conditions(
            cn.read_csv(spark, str(p)), custom={"source_id": "weird_id"}
        )
        assert df.collect()[0]["source_id"] == "A1"


# ---------------------------------------------------------------------------
# FHIR NDJSON connector
# ---------------------------------------------------------------------------


class TestFHIRConnector:
    def test_conditions(self, spark, fhir_path):
        from kgnorm import connectors as cn

        rows = {r["source_id"]: r
                for r in cn.fhir_conditions(spark, fhir_path).collect()}
        assert set(rows) == {"c1", "c2", "c3"}
        assert rows["c1"]["code"] == "E11.9"
        assert rows["c1"]["code_system"] == "ICD10CM"  # URL → vocab
        assert rows["c1"]["patient_source_id"] == "P1"
        assert rows["c1"]["status"] == "active"
        assert str(rows["c1"]["onset_datetime"]) == "2024-01-15 10:30:00"
        # text-only CodeableConcept (fhir_connector.py:280)
        assert rows["c2"]["code"] is None
        assert rows["c2"]["display_text"] == "free text only"
        assert rows["c2"]["status"] == "resolved"  # remission → resolved
        assert str(rows["c2"]["onset_datetime"])[:10] == "2024-02-01"
        # display falls back to .text when coding has no display
        assert rows["c3"]["display_text"] == "dm2"
        assert rows["c3"]["code_system"] == "SNOMED"
        # missing clinicalStatus → unknown (status_map.get default :445)
        assert rows["c3"]["status"] == "unknown"

    def test_drugs(self, spark, fhir_path):
        from kgnorm import connectors as cn

        rows = {r["source_id"]: r
                for r in cn.fhir_drugs(spark, fhir_path).collect()}
        assert rows["m1"]["code"] == "6809"
        assert rows["m1"]["code_system"] == "RxNorm"
        assert rows["m1"]["dose_value"] == 500.0
        assert rows["m1"]["route"] == "Oral"
        assert rows["m1"]["sig"] == "500 mg PO BID"
        # authoredOn fallback for start (fhir_connector.py:530-532)
        assert str(rows["m1"]["start_datetime"])[:10] == "2024-01-01"
        # medicationReference display-only fallback (:506-511)
        assert rows["m2"]["code"] is None
        assert rows["m2"]["display_text"] == "Aspirin 81mg"
        assert rows["m2"]["status"] == "stopped"  # cancelled → stopped
        assert str(rows["m2"]["end_datetime"])[:10] == "2024-03-01"

    def test_observations_and_patients(self, spark, fhir_path):
        from kgnorm import connectors as cn

        o = cn.fhir_measurements(spark, fhir_path).collect()[0]
        assert o["code"] == "4548-4" and o["code_system"] == "LOINC"
        assert o["value_numeric"] == 8.2 and o["unit"] == "%"
        assert o["range_low"] == 4.0 and o["range_high"] == 5.6
        assert o["interpretation"] == "H"
        p = cn.fhir_patients(spark, fhir_path).collect()[0]
        assert p["given_name"] == "Jane Q" and p["family_name"] == "Doe"
        assert p["gender"] == "female" and str(p["birth_date"]) == "1960-05-01"
        assert p["mrn"] == "MRN-1" and p["city"] == "Springfield"


# ---------------------------------------------------------------------------
# ETL
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def etl_dims(spark):
    concepts = spark.createDataFrame(
        [
            (45500001, "Type 2 diabetes mellitus", "E11.9", "ICD10CM"),
            (45500002, "Essential hypertension", "I10", "ICD10CM"),
            (45500003, "Heart failure, unspecified", "I50.9", "ICD10CM"),
            (201826, "Type 2 diabetes mellitus", "44054006", "SNOMED"),
            (320128, "Essential hypertension", "59621000", "SNOMED"),
            (316139, "Congestive heart failure", "42343007", "SNOMED"),
            (40164929, "metformin 500 MG", "6809", "RxNorm"),
            (1308216, "lisinopril 10 MG", "29046", "RxNorm"),
            (3004410, "Hemoglobin A1c", "4548-4", "LOINC"),
            (3016723, "Creatinine", "2160-0", "LOINC"),
            (3023103, "Potassium", "2823-3", "LOINC"),
        ],
        "concept_id long, concept_name string, concept_code string, vocabulary_id string",
    )
    relationships = spark.createDataFrame(
        [
            (45500001, 201826, "Maps to"),
            (45500002, 320128, "Maps to"),
            (45500003, 316139, "Maps to"),
            (40164929, 40164929, "Maps to"),
            (1308216, 1308216, "Maps to"),
            (3004410, 3004410, "Maps to"),
            (3016723, 3016723, "Maps to"),
            (3023103, 3023103, "Maps to"),
        ],
        "concept_id_1 long, concept_id_2 long, relationship_id string",
    )
    persons = spark.createDataFrame(
        [("P1", 1), ("P2", 2), ("P3", 3)],
        "patient_source_id string, person_id long",
    )
    return concepts, relationships, persons


class TestConditionETL:
    def test_mapping_and_fields(self, spark, csv_dir, etl_dims):
        from kgnorm import connectors as cn, etl

        src = cn.csv_conditions(cn.read_csv(spark, os.path.join(csv_dir, "conditions.csv")))
        out = etl.condition_occurrences(src, *etl_dims)
        rows = {r["condition_source_id"]: r for r in out.collect()}
        dx1 = rows["DX1"]
        assert dx1["person_id"] == 1
        assert dx1["condition_concept_id"] == 201826  # ICD10CM → SNOMED
        assert dx1["condition_source_concept_id"] == 45500001
        assert str(dx1["condition_start_date"]) == "2024-01-15"
        assert str(dx1["condition_start_datetime"]) == "2024-01-15 00:00:00"
        assert dx1["condition_type_concept_id"] == 32817
        assert dx1["condition_status_concept_id"] == 32904  # active
        assert dx1["condition_source_value"] == "ICD10CM:E11.9"
        assert dx1["condition_status_source_value"] == "active"
        # raw code_system preserved in source_value even when lowercase
        assert rows["DX2"]["condition_source_value"] == "icd10:I10"
        assert rows["DX2"]["condition_start_date"] is not None  # run-date default
        assert rows["DX2"]["condition_concept_id"] == 320128
        assert rows["DX2"]["condition_status_concept_id"] == 32893  # resolved
        assert rows["DX3"]["condition_status_concept_id"] == 32895  # inactive
        # unmapped → 0 (condition_etl.py:236)
        assert rows["DX4"]["condition_concept_id"] == 0
        assert rows["DX4"]["condition_source_concept_id"] is None
        assert rows["DX4"]["condition_status_concept_id"] is None  # unknown
        # missing onset → run date (condition_etl.py:336)
        assert rows["DX4"]["condition_start_date"] is not None

    def test_source_value_truncated_50(self, spark, etl_dims):
        from kgnorm import etl

        src = spark.createDataFrame(
            [("S1", "P1", "X" * 80, "ICD10CM", "x", "active", None)],
            "source_id string, patient_source_id string, code string,"
            " code_system string, display_text string, status string,"
            " onset_datetime timestamp",
        )
        out = etl.condition_occurrences(src, *etl_dims).collect()[0]
        assert len(out["condition_source_value"]) == 50


class TestDrugETL:
    def test_route_quantity_days(self, spark, csv_dir, etl_dims):
        from kgnorm import connectors as cn, etl

        src = cn.csv_drugs(cn.read_csv(spark, os.path.join(csv_dir, "meds.csv")))
        out = etl.drug_exposures(src, *etl_dims)
        rows = {r["drug_source_id"]: r for r in out.collect()}
        rx1 = rows["RX1"]
        assert rx1["drug_concept_id"] == 40164929
        assert rx1["route_concept_id"] == 4128794  # oral
        assert rx1["days_supply"] == 30
        assert str(rx1["drug_exposure_end_date"]) == "2024-01-31"
        rx2 = rows["RX2"]
        assert rx2["route_concept_id"] == 4128794  # PO lowercased
        # no end date → start + 30 (drug_etl.py:284)
        assert str(rx2["drug_exposure_end_date"]) == "2024-03-02"
        assert rx2["days_supply"] is None  # only derived when end exists
        assert rows["RX3"]["route_concept_id"] is None

    def test_quantity_digit_sweep(self, spark, etl_dims):
        from kgnorm import etl

        src = spark.createDataFrame(
            [("D1", "P1", "6809", "RxNorm", "x", "active", None, None,
              "500 mg", "mg", "oral", None, None)],
            "source_id string, patient_source_id string, code string,"
            " code_system string, display_text string, status string,"
            " start_datetime timestamp, end_datetime timestamp,"
            " dose_value string, dose_unit string, route string,"
            " frequency string, days_supply int",
        )
        out = etl.drug_exposures(src, *etl_dims).collect()[0]
        # '500 mg' → digits+dot sweep → 500 (drug_etl.py:238-249)
        assert out["quantity"] == 500.0


class TestMeasurementETL:
    def test_units_operators_type(self, spark, csv_dir, etl_dims):
        from kgnorm import connectors as cn, etl

        src = cn.csv_measurements(cn.read_csv(spark, os.path.join(csv_dir, "labs.csv")))
        out = etl.measurements(src, *etl_dims)
        rows = {r["measurement_source_id"]: r for r in out.collect()}
        l1 = rows["L1"]
        assert l1["measurement_concept_id"] == 3004410
        assert l1["unit_concept_id"] == 8554  # %
        assert l1["value_as_number"] == 8.2
        assert l1["measurement_type_concept_id"] == 32856  # LOINC hint → lab
        assert l1["range_low"] == 4.0 and l1["range_high"] == 5.6
        # '<0.2' → operator '<' (4171756), value 0.2
        l2 = rows["L2"]
        assert l2["operator_concept_id"] == 4171756
        assert l2["value_as_number"] == 0.2
        assert l2["unit_concept_id"] == 8840  # mg/dL exact
        # '<=6.1': '<' matches FIRST (insertion order), '=6.1' unparseable
        # → falls back to the numeric column (measurement_etl.py:275-287)
        l3 = rows["L3"]
        assert l3["operator_concept_id"] == 4171756
        assert l3["value_as_number"] == 5.9
        # 'MMHG' exact miss, lowercase retry hits 'mmhg'
        assert l3["unit_concept_id"] == 8876

    def test_equals_operator(self, spark, etl_dims):
        from kgnorm import etl

        src = spark.createDataFrame(
            [("M1", "P1", "4548-4", "LOINC", "a1c", None, "=7.5", "%",
              None, None, None, None)],
            "source_id string, patient_source_id string, code string,"
            " code_system string, display_text string, value_numeric double,"
            " value_text string, unit string, range_low double,"
            " range_high double, interpretation string, effective_datetime timestamp",
        )
        out = etl.measurements(src, *etl_dims).collect()[0]
        assert out["operator_concept_id"] == 4172703
        assert out["value_as_number"] == 7.5


class TestPersonVisitObservationDeathETL:
    def test_persons_maps_and_defaults(self, spark):
        from kgnorm import etl

        src = spark.createDataFrame(
            [("P1", "Jane", "Doe", "1960-05-01", "female", "2106-3", "Hispanic"),
             ("P2", "Al", "Poe", None, "unknown", "martian", None)],
            "source_id string, given_name string, family_name string,"
            " birth_date string, gender string, race string, ethnicity string",
        ).withColumn("birth_date", F.to_date("birth_date"))
        rows = {r["person_source_value"]: r for r in etl.persons(src).collect()}
        p1 = rows["P1"]
        assert p1["gender_concept_id"] == 8532
        assert p1["year_of_birth"] == 1960 and p1["month_of_birth"] == 5
        assert p1["race_concept_id"] == 8527  # CDC code 2106-3 → white
        assert p1["ethnicity_concept_id"] == 38003563
        assert len(p1["person_id"]) == 64  # sha2 hex, engine id policy
        p2 = rows["P2"]
        # missing birth date → 1900 default year (person_etl.py:396-397)
        assert p2["year_of_birth"] == 1900 and p2["month_of_birth"] is None
        assert p2["gender_concept_id"] == 8551
        assert p2["race_concept_id"] == 8552   # unmapped → unknown
        assert p2["ethnicity_concept_id"] == 0

    def test_visits_infer_end_date(self, spark, etl_dims):
        from kgnorm import etl

        src = spark.createDataFrame(
            [("V1", "P1", "inpatient", "2024-01-01 08:00:00", None),
             ("V2", "P2", "telehealth", "2024-02-01 08:00:00", "2024-02-03 10:00:00"),
             ("V3", "P3", None, None, None)],
            "source_id string, patient_source_id string, visit_type string,"
            " start_datetime string, end_datetime string",
        ).withColumn("start_datetime", F.to_timestamp("start_datetime")) \
         .withColumn("end_datetime", F.to_timestamp("end_datetime"))
        rows = {r["visit_source_id"]: r for r in
                etl.visit_occurrences(src, etl_dims[2]).collect()}
        assert rows["V1"]["visit_concept_id"] == 9201
        # missing end → inferred from start (visit_etl.py:131)
        assert str(rows["V1"]["visit_end_date"]) == "2024-01-01"
        assert rows["V2"]["visit_concept_id"] == 581478
        assert str(rows["V2"]["visit_end_date"]) == "2024-02-03"
        # no type → unknown → outpatient default (VISIT_CONCEPT_MAP)
        assert rows["V3"]["visit_concept_id"] == 9202
        # no start → run-date default (visit_etl.py:226-230)
        assert rows["V3"]["visit_start_date"] is not None

    def test_observations_value_concepts(self, spark, etl_dims):
        from kgnorm import etl

        src = spark.createDataFrame(
            [("O1", "P1", "4548-4", "LOINC", "obs", None, "Current Smoker", "%", None),
             ("O2", "P2", "4548-4", "LOINC", "obs", 3.5, "weird value", None, None)],
            "source_id string, patient_source_id string, code string,"
            " code_system string, display_text string, value_numeric double,"
            " value_text string, unit string, effective_datetime timestamp",
        )
        rows = {r["observation_source_id"]: r for r in
                etl.observations(src, *etl_dims).collect()}
        # VALUE_CONCEPT_MAP is lowercase-keyed (observation_etl.py:72-96)
        assert rows["O1"]["value_as_concept_id"] == 4298794
        assert rows["O1"]["unit_concept_id"] == 8554
        assert rows["O2"]["value_as_concept_id"] is None
        assert rows["O2"]["value_as_number"] == 3.5

    def test_deaths(self, spark, etl_dims):
        from kgnorm import etl

        src = spark.createDataFrame(
            [("P1", "2024-03-01 10:00:00", "autopsy", "E11.9", "ICD10CM"),
             ("P2", "2024-04-01 11:00:00", "nonsense", None, None)],
            "patient_source_id string, death_datetime string, death_type string,"
            " code string, code_system string",
        ).withColumn("death_datetime", F.to_timestamp("death_datetime"))
        rows = {r["person_id"]: r for r in etl.deaths(src, *etl_dims).collect()}
        d1 = rows[1]
        assert d1["death_type_concept_id"] == 32886
        assert d1["cause_concept_id"] == 201826
        assert d1["cause_source_value"] == "ICD10CM:E11.9"
        d2 = rows[2]
        assert d2["death_type_concept_id"] == 32817  # unknown type → default
        assert d2["cause_concept_id"] == 0 and d2["cause_source_value"] is None


class TestRemainingConnectorPaths:
    def test_csv_visits_and_procedures(self, spark, tmp_path):
        from kgnorm import connectors as cn

        v = tmp_path / "visits.csv"
        v.write_text(
            "encounter_id,patientid,admission_date,discharge_date,facility\n"
            "E1,P1,2024-01-01 08:00:00,2024-01-05 10:00:00,General Hospital\n")
        row = cn.csv_visits(cn.read_csv(spark, str(v))).collect()[0]
        assert row["source_id"] == "E1"
        assert str(row["start_datetime"]) == "2024-01-01 08:00:00"
        assert row["facility_name"] == "General Hospital"

        p = tmp_path / "procs.csv"
        p.write_text("procedure_id,patient_id,cpt_code,procedure_name,procedure_date\n"
                     "PR1,P1,99213,Office visit,2024-02-01\n")
        row = cn.csv_procedures(cn.read_csv(spark, str(p))).collect()[0]
        assert row["code"] == "99213"
        assert row["code_system"] == "CPT4"  # default (:631)
        assert str(row["performed_datetime"])[:10] == "2024-02-01"

    def test_db_patients(self, spark):
        import datetime
        from kgnorm import dbsource

        df = spark.createDataFrame(
            [("P1", "Jane", "Doe", datetime.date(1960, 5, 1), "F", "White")],
            "PAT_ID string, FNAME string, LNAME string, DOB date,"
            " SEX string, RACE string")
        r = dbsource.db_patients(df).collect()[0]
        assert r["source_id"] == "P1" and r["gender"] == "female"
        assert str(r["birth_date"]) == "1960-05-01"
        assert r["family_name"] == "Doe"

    def test_measurement_type_explicit(self, spark, etl_dims):
        from kgnorm import etl

        src = spark.createDataFrame(
            [("M1", "P1", "4548-4", "LOINC", "a1c", 7.0, None, "%",
              None, None, None, None, "Vital"),
             ("M2", "P1", "4548-4", "LOINC", "a1c", 7.0, None, "%",
              None, None, None, None, "bogus")],
            "source_id string, patient_source_id string, code string,"
            " code_system string, display_text string, value_numeric double,"
            " value_text string, unit string, range_low double,"
            " range_high double, interpretation string,"
            " effective_datetime timestamp, measurement_type string",
        )
        rows = {r["measurement_source_id"]: r for r in
                etl.measurements(src, *etl_dims).collect()}
        # explicit type wins over the LOINC hint (measurement_etl.py:338-345)
        assert rows["M1"]["measurement_type_concept_id"] == 32836
        # unknown explicit type falls through to the hint
        assert rows["M2"]["measurement_type_concept_id"] == 32856
