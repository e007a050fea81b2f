"""FHIR R4 export/import (kgnorm.fhir).

Mirrors reference fhir_exporter.py status/verification/category/coding
rules and fhir_import.py parse rules; asserts export → import
round-trip on key fields.
"""

import json

import pytest
from pyspark.sql import functions as F

from kgnorm import fhir


@pytest.fixture(scope="module")
def facts(spark):
    rows = [
        # conv, concept, assertion, temporality, experiencer, name, domain, confidence
        ("C1", 201826, "present", "current", "patient", "Type 2 diabetes mellitus", "condition", 0.95),
        ("C1", 316866, "absent", "current", "patient", "Hypertension", "condition", 0.80),
        ("C1", 0, "possible", "historical", "patient", "Old stroke", "condition", 0.70),
        ("C1", 1503297, "present", "current", "patient", "Metformin", "drug", 0.99),
        ("C1", 1503297, "absent", "historical", "patient", "Metformin", "drug", 0.99),
        ("C1", 3004249, "present", "current", "patient", "Blood Pressure panel", "measurement", 0.95),
        ("C1", 3013682, "present", "current", "patient", "BUN", "measurement", 0.70),
        ("C2", 4336464, "present", "future", "patient", "Colonoscopy", "procedure", 0.90),
        ("C2", 437175, "present", "current", "patient", "Insomnia", "observation", 0.90),  # unmapped
    ]
    return spark.createDataFrame(
        rows, "conv_id string, omop_concept_id long, assertion string,"
              " temporality string, experiencer string, concept_name string,"
              " domain string, confidence double")


class TestExport:
    def test_resource_types_and_unmapped_dropped(self, spark, facts):
        rows = fhir.fhir_rows(facts).collect()
        types = {r.resource_type for r in rows}
        assert types == {"Condition", "MedicationStatement", "Observation", "Procedure"}
        assert len(rows) == 8  # observation-domain fact dropped (export_fact → None)

    def test_condition_statuses(self, spark, facts):
        rows = {(r.display, r.resource_type): r for r in fhir.fhir_rows(facts).collect()}
        dm = rows[("Type 2 diabetes mellitus", "Condition")]
        assert (dm.status, dm.verification_status) == ("active", "confirmed")
        htn = rows[("Hypertension", "Condition")]
        assert (htn.status, htn.verification_status) == ("inactive", "refuted")
        stroke = rows[("Old stroke", "Condition")]
        assert (stroke.status, stroke.verification_status) == ("resolved", "provisional")
        # no-omop fact uses the label-slug code fallback
        assert stroke.code == "old-stroke" and stroke.code_system is None

    def test_medication_and_procedure_status(self, spark, facts):
        rows = fhir.fhir_rows(facts).collect()
        med = {r.status for r in rows if r.resource_type == "MedicationStatement"}
        assert med == {"active", "stopped"}
        proc = [r for r in rows if r.resource_type == "Procedure"][0]
        assert proc.status == "preparation"  # temporality=future

    def test_observation_category_and_status(self, spark, facts):
        rows = {r.display: r for r in fhir.fhir_rows(facts).collect() if r.resource_type == "Observation"}
        assert rows["Blood Pressure panel"].category == "vital-signs"
        assert rows["Blood Pressure panel"].status == "final"
        assert rows["BUN"].category == "laboratory"
        assert rows["BUN"].status == "preliminary"

    def test_json_documents_valid(self, spark, facts):
        docs = fhir.fhir_resources_json(facts).collect()
        for d in docs:
            body = json.loads(d.resource_json)
            assert body["resourceType"] == d.resource_type
            assert body["subject"]["reference"].startswith("Patient/")
            assert body["code"]["coding"][0]["code"]

    def test_bundle_counts(self, spark, facts):
        b = {r.conv_id: r for r in fhir.fhir_bundle(facts).collect()}
        assert b["C1"].total == 7 + 1  # 7 resources + Patient
        assert b["C2"].total == 1 + 1
        assert b["C1"].bundle_type == "collection"


class TestImportRoundTrip:
    def test_roundtrip_key_fields(self, spark, facts):
        exported = fhir.fhir_resources_json(facts)
        imported = fhir.import_facts(exported)
        got = {(r.conv_id, r.domain, r.concept_name): r for r in imported.collect()}
        # mapped facts come back with domain + concept id intact
        dm = got[("C1", "condition", "Type 2 diabetes mellitus")]
        assert dm.omop_concept_id == 201826
        assert dm.assertion == "present"
        # inactive condition → absent on import (reference :325-328)
        htn = got[("C1", "condition", "Hypertension")]
        assert htn.assertion == "absent"
        # stopped medication → absent (reference :391-394); both Metformin
        # rows survive (distinct statuses)
        meds = [r for r in imported.collect() if r.domain == "drug"]
        assert {m.assertion for m in meds} == {"present", "absent"}
        # slug-coded (no OMOP) fact imports with concept id 0
        stroke = got[("C1", "condition", "Old stroke")]
        assert stroke.omop_concept_id == 0

    def test_import_external_ndjson_shape(self, spark):
        doc = json.dumps({
            "resourceType": "Condition", "id": "x1", "status": "active",
            "code": {"coding": [{"system": "http://snomed.info/sct",
                                 "code": "44054006", "display": "Type 2 diabetes"}],
                     "text": "T2DM"},
            "subject": {"reference": "Patient/P9"},
        })
        df = spark.createDataFrame([(doc,)], ["resource_json"])
        got = fhir.import_facts(df).collect()
        assert len(got) == 1
        r = got[0]
        assert (r.conv_id, r.domain, r.omop_concept_id) == ("P9", "condition", 44054006)
