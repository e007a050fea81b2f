"""C-CDA connector — behavior pinned against
backend/app/connectors/ccda_connector.py."""

import pytest

CCDA_DOC = """<?xml version="1.0"?>
<ClinicalDocument>
  <id root="2.16.840.1.113883.19.5" extension="DOC1"/>
  <recordTarget>
    <patientRole>
      <id root="2.16.840.1.113883.19.5.99999.2" extension="MRN-77"/>
      <id root="2.16.840.1.113883.4.1" extension="111-22-3333"/>
      <addr><streetAddressLine>1 Main St</streetAddressLine>
        <city>Springfield</city><state>IL</state>
        <postalCode>62704</postalCode><country>US</country></addr>
      <patient>
        <name><given>Jane</given><given>Q</given><family>Doe</family></name>
        <administrativeGenderCode code="F"/>
        <birthTime value="19600501"/>
        <raceCode code="2106-3" codeSystemName="CDC" displayName="White"/>
        <ethnicGroupCode code="2186-5" displayName="Not Hispanic or Latino"/>
      </patient>
    </patientRole>
  </recordTarget>
  <component><structuredBody>
    <component><section>
      <templateId root="2.16.840.1.113883.10.20.22.2.5.1"/>
      <entry><act><entryRelationship><observation>
        <statusCode code="active"/>
        <effectiveTime><low value="20240110"/></effectiveTime>
        <value code="44054006" codeSystem="2.16.840.1.113883.6.96"
               codeSystemName="SNOMED" displayName="Type 2 diabetes mellitus"/>
      </observation></entryRelationship></act></entry>
      <entry><act><entryRelationship><observation>
        <statusCode code="completed"/>
        <value><translation code="J18.9" codeSystemName="ICD10CM"
               displayName="Pneumonia"/></value>
      </observation></entryRelationship></act></entry>
    </section></component>
    <component><section>
      <templateId root="2.16.840.1.113883.10.20.22.2.1.1"/>
      <entry><substanceAdministration>
        <statusCode code="active"/>
        <effectiveTime><low value="20240101"/><high value="20240201"/></effectiveTime>
        <routeCode code="C38288" displayName="Oral"/>
        <doseQuantity value="500" unit="mg"/>
        <consumable><manufacturedProduct><manufacturedMaterial>
          <code code="6809" codeSystemName="RxNorm" displayName="Metformin"/>
        </manufacturedMaterial></manufacturedProduct></consumable>
      </substanceAdministration></entry>
    </section></component>
    <component><section>
      <templateId root="2.16.840.1.113883.10.20.22.2.3.1"/>
      <entry><organizer>
        <code code="CBC" displayName="CBC panel"/>
        <effectiveTime value="20240301070000"/>
        <component><observation>
          <code code="4548-4" codeSystemName="LOINC" displayName="HbA1c"/>
          <value xsi:type="PQ" value="8.2" unit="%"/>
          <interpretationCode code="H"/>
          <referenceRange><observationRange><value>
            <low value="4.0"/><high value="5.6"/>
          </value></observationRange></referenceRange>
        </observation></component>
        <component><observation>
          <code code="NOTE" displayName="Comment"/>
          <value xsi:type="ST">slightly hemolyzed</value>
        </observation></component>
      </organizer></entry>
    </section></component>
    <component><section>
      <templateId root="2.16.840.1.113883.10.20.22.2.4.1"/>
      <entry><organizer>
        <effectiveTime value="20240301"/>
        <component><observation>
          <code code="8867-4" codeSystemName="LOINC" displayName="Heart rate"/>
          <value xsi:type="PQ" value="72" unit="/min"/>
        </observation></component>
      </organizer></entry>
    </section></component>
  </structuredBody></component>
</ClinicalDocument>
"""


@pytest.fixture(scope="module")
def docs(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("ccda")
    (d / "doc1.xml").write_text(CCDA_DOC)
    from kgnorm import ccda

    return ccda.read_documents(spark, str(d)).persist()


class TestCCDA:
    def test_patient(self, spark, docs):
        from kgnorm import ccda

        p = ccda.ccda_patients(docs).collect()[0]
        # id = root^extension (:301-314)
        assert p["source_id"] == "2.16.840.1.113883.19.5.99999.2^MRN-77"
        # MRN skips the SSN OID id (:378-386)
        assert p["mrn"] == "MRN-77"
        assert p["given_name"] == "Jane Q" and p["family_name"] == "Doe"
        assert p["gender"] == "female"
        assert p["race"] == "White"
        assert p["city"] == "Springfield"
        # faithful: reference _parse_date never succeeds
        assert p["birth_date"] is None

    def test_problems(self, spark, docs):
        from kgnorm import ccda

        rows = sorted(ccda.ccda_conditions(docs).collect(),
                      key=lambda r: r["source_id"])
        assert len(rows) == 2
        a, b = rows
        assert a["code"] == "44054006" and a["code_system"] == "SNOMED"
        assert a["display_text"] == "Type 2 diabetes mellitus"
        assert a["status"] == "active"
        assert a["onset_datetime"] is None  # faithful dates
        # translation fallback when the value has no direct code (:493-496)
        assert b["code"] == "J18.9" and b["code_system"] == "ICD10CM"
        assert b["status"] == "resolved"  # completed → resolved

    def test_fixed_dates(self, spark, docs):
        from kgnorm import ccda

        a = sorted(ccda.ccda_conditions(docs, faithful_dates=False).collect(),
                   key=lambda r: r["source_id"])[0]
        assert str(a["onset_datetime"])[:10] == "2024-01-10"

    def test_medications(self, spark, docs):
        from kgnorm import ccda

        m = ccda.ccda_drugs(docs).collect()[0]
        assert m["code"] == "6809" and m["code_system"] == "RxNorm"
        assert m["display_text"] == "Metformin"
        assert m["dose_value"] == 500.0 and m["dose_unit"] == "mg"
        assert m["route"] == "Oral"
        assert m["status"] == "active"

    def test_lab_results(self, spark, docs):
        from kgnorm import ccda

        rows = sorted(ccda.ccda_lab_results(docs).collect(),
                      key=lambda r: r["source_id"])
        pq, st = rows
        assert pq["code"] == "4548-4" and pq["value_numeric"] == 8.2
        assert pq["unit"] == "%" and pq["interpretation"] == "H"
        assert pq["range_low"] == 4.0 and pq["range_high"] == 5.6
        # ST value → text, numeric stays NULL (:692-703)
        assert st["value_numeric"] is None
        assert st["value_text"] == "slightly hemolyzed"

    def test_vitals(self, spark, docs):
        from kgnorm import ccda

        v = ccda.ccda_vitals(docs).collect()[0]
        assert v["code"] == "8867-4" and v["value_numeric"] == 72.0
        assert v["unit"] == "/min"

    def test_chains_into_etl(self, spark, docs):
        from kgnorm import etl, ccda
        from pyspark.sql import functions as F

        concepts = spark.createDataFrame(
            [(201826, "T2DM", "44054006", "SNOMED")],
            "concept_id long, concept_name string, concept_code string, vocabulary_id string")
        rels = spark.createDataFrame(
            [(201826, 201826, "Maps to")],
            "concept_id_1 long, concept_id_2 long, relationship_id string")
        persons = spark.createDataFrame(
            [("2.16.840.1.113883.19.5.99999.2^MRN-77", 9)],
            "patient_source_id string, person_id long")
        src = ccda.ccda_conditions(docs).withColumn(
            "visit_source_id", F.lit(None).cast("string"))
        out = {r["condition_source_id"]: r for r in
               etl.condition_occurrences(src, concepts, rels, persons).collect()}
        snomed_row = [r for r in out.values() if r["condition_concept_id"] == 201826]
        assert snomed_row and snomed_row[0]["person_id"] == 9
