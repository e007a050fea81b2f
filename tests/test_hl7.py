"""HL7 v2.x connector — behavior pinned against
backend/app/connectors/hl7v2_connector.py, including its two defects
(dates that never parse; repeated-segment codes read from occurrence 0).
"""

import pytest

MSG1 = (
    "MSH|^~\\&|EPIC|GENHOSP|LAB|GENHOSP|20240115103000||ADT^A01|MSG001|P|2.5\r"
    "PID|1||PAT001^^^MRN||Doe^Jane^Q||19600501|F||2106-3^White|1 Main St^^Springfield^IL^62704||555-1234^PRN|||||||||N\r"
    "PV1|1|I|ICU^101^A||||1234^Smith^John||||||||||||V9001|||||||||||||||||||||||||20240114080000|20240118120000\r"
    "DG1|1|I10|E11.9^Type 2 diabetes mellitus^ICD10CM||20240110|F\r"
    "DG1|2|I10|I10^Essential hypertension^ICD10CM||20240111|A\r"
    "AL1|1||PCN^Penicillin|SV|Hives\r"
)
MSG2 = (
    "MSH|^~\\&|EPIC|GENHOSP|LAB|GENHOSP|20240116090000||ORU^R01|MSG002|P|2.5\r"
    "PID|1||PAT001^^^MRN||Doe^Jane||19600501|F\r"
    "OBR|1||ORD1|CBC|||20240116083000\r"
    "OBX|1|NM|4548-4^HbA1c^LOINC||8.2|%^percent|4.0-5.6|H|||F||||20240116084500\r"
    "OBX|2|NM|2160-0^Creatinine^LOINC||1.1|mg/dL|0.6-1.2|N\r"
    "OBX|3|ST|NOTE^Comment||specimen slightly hemolyzed\r"
    "RXA|0|1|20240116|20240116|6809^Metformin^RxNorm|500|mg^milligram||take with food\r"
)


@pytest.fixture(scope="module")
def msgs(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("hl7")
    (d / "feed.hl7").write_text(MSG1 + MSG2)
    from kgnorm import hl7

    return hl7.read_messages(spark, str(d)).persist()


class TestParsing:
    def test_message_split_and_msh(self, msgs):
        rows = {r["message_control_id"]: r for r in msgs.collect()}
        assert set(rows) == {"MSG001", "MSG002"}
        assert rows["MSG001"]["message_type"] == "ADT^A01"
        assert rows["MSG001"]["sending_facility"] == "GENHOSP"

    def test_patients(self, spark, msgs):
        from kgnorm import hl7

        pats = hl7.hl7_patients(msgs).collect()
        # PAT001 appears in both messages → deduped to one
        assert len(pats) == 1
        p = pats[0]
        assert p["source_id"] == "PAT001" and p["mrn"] == "PAT001"
        assert p["family_name"] == "Doe" and p["given_name"] == "Jane"
        assert p["gender"] == "female"
        assert p["city"] == "Springfield" and p["postal_code"] == "62704"
        # faithful mode: the reference datetime parser NEVER succeeds
        assert p["birth_date"] is None
        assert p["deceased"] is False

    def test_fixed_dates_mode(self, spark, msgs):
        from kgnorm import hl7

        p = hl7.hl7_patients(msgs, faithful_dates=False).collect()[0]
        assert str(p["birth_date"]) == "1960-05-01"
        v = {r["source_id"]: r for r in
             hl7.hl7_visits(msgs, faithful_dates=False).collect()}["V9001"]
        assert str(v["start_datetime"]) == "2024-01-14 08:00:00"
        assert str(v["end_datetime"]) == "2024-01-18 12:00:00"

    def test_visits(self, spark, msgs):
        from kgnorm import hl7

        vs = {r["source_id"]: r for r in hl7.hl7_visits(msgs).collect()}
        v = vs["V9001"]
        assert v["visit_type"] == "inpatient"
        assert v["patient_source_id"] == "PAT001"
        assert v["department"] == "ICU^101^A"
        assert v["attending_provider_id"] == "1234"
        assert v["attending_provider_name"] == "John Smith"
        # MSG2 has no PV1 → no visit row; dedup by visit id
        assert set(vs) == {"V9001"}


class TestSegmentExtraction:
    def test_conditions_first_segment_code_quirk(self, spark, msgs):
        from kgnorm import hl7

        cs = {r["source_id"]: r for r in hl7.hl7_conditions(msgs).collect()}
        assert set(cs) == {"MSG001-DG1-0", "MSG001-DG1-1"}
        # BOTH rows carry the FIRST DG1's code — get_components has no
        # segment index in the reference (:545), occurrence 1's I10 code
        # is never read
        assert cs["MSG001-DG1-0"]["code"] == "E11.9"
        assert cs["MSG001-DG1-1"]["code"] == "E11.9"
        # but per-occurrence fields DO use occurrence i (:560-563)
        assert cs["MSG001-DG1-0"]["category"] == "F"
        assert cs["MSG001-DG1-1"]["category"] == "A"
        assert cs["MSG001-DG1-0"]["code_system"] == "ICD10CM"

    def test_measurements(self, spark, msgs):
        from kgnorm import hl7

        ms = {r["source_id"]: r for r in hl7.hl7_measurements(msgs).collect()}
        assert set(ms) == {"MSG002-OBX-0", "MSG002-OBX-1", "MSG002-OBX-2"}
        m0 = ms["MSG002-OBX-0"]
        # code/display/unit from OBX occurrence 0 (reference quirk)
        assert m0["code"] == "4548-4" and m0["display_text"] == "HbA1c"
        assert m0["unit"] == "%"
        assert m0["value_numeric"] == 8.2
        assert m0["range_low"] == 4.0 and m0["range_high"] == 5.6
        assert m0["interpretation"] == "H"
        m1 = ms["MSG002-OBX-1"]
        assert m1["code"] == "4548-4"  # quirk: occurrence 0's code again
        assert m1["value_numeric"] == 1.1
        assert m1["range_low"] == 0.6 and m1["range_high"] == 1.2
        m2 = ms["MSG002-OBX-2"]
        # ST value type → text, not numeric
        assert m2["value_numeric"] is None
        assert m2["value_text"] == "specimen slightly hemolyzed"

    def test_drugs_and_allergies(self, spark, msgs):
        from kgnorm import hl7

        d = hl7.hl7_drugs(msgs).collect()
        assert len(d) == 1
        assert d[0]["code"] == "6809" and d[0]["display_text"] == "Metformin"
        assert d[0]["code_system"] == "RxNorm"
        assert d[0]["dose_value"] == 500.0 and d[0]["dose_unit"] == "mg"
        assert d[0]["sig"] == "take with food"
        a = hl7.hl7_allergies(msgs).collect()
        assert len(a) == 1
        assert a[0]["display_text"] == "Allergy: Penicillin"
        assert a[0]["criticality"] == "SV" and a[0]["reaction"] == "Hives"

    def test_chains_into_etl(self, spark, msgs, tmp_path):
        """HL7 conditions flow through the condition ETL unchanged."""
        from kgnorm import etl, hl7

        concepts = spark.createDataFrame(
            [(45500001, "T2DM", "E11.9", "ICD10CM"), (201826, "T2DM", "44054006", "SNOMED")],
            "concept_id long, concept_name string, concept_code string, vocabulary_id string")
        rels = spark.createDataFrame(
            [(45500001, 201826, "Maps to")],
            "concept_id_1 long, concept_id_2 long, relationship_id string")
        persons = spark.createDataFrame(
            [("PAT001", 7)], "patient_source_id string, person_id long")
        out = etl.condition_occurrences(
            hl7.hl7_conditions(msgs), concepts, rels, persons).collect()
        assert all(r["person_id"] == 7 for r in out)
        assert all(r["condition_concept_id"] == 201826 for r in out)
        assert out[0]["condition_source_value"] == "ICD10CM:E11.9"
