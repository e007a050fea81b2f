"""FHIR R4 export: facts → Condition / MedicationStatement /
Observation / Procedure resources.

Port of ``backend/app/services/fhir_exporter.py``:

* resource-type dispatch on fact domain (:173-192);
* Condition clinical/verification status rules (:282-316);
* MedicationStatement active/stopped (:381-390);
* Observation final/preliminary + vital-vs-lab category by label
  keyword (:447-457);
* Procedure status by temporality (:520-531);
* coding arrays with the OMOP system URI and the label-slug fallback
  (:124-130, :322-346) — the fixture vocabulary carries OMOP ids only,
  so icd10/snomed/loinc/rxnorm coding rows (reference :324-335) are
  emitted when those codes exist on the fact and the OMOP row otherwise;
* bundle assembly with a per-conversation Patient resource (:194-233).

Spark-first: the whole export is ONE projection over the facts table
(CASE expressions + ``to_json(struct(...))``) — no UDF, no shuffle; the
bundle is a grouped collect_list per conversation only when a single
JSON document per patient is required.  Resource ids are deterministic
sha2 digests instead of the reference's ``uuid4`` (:167-171) — random
ids are unreproducible across retried tasks, which breaks exactly-once
sinks; determinism is the same documented deviation the graph ids make
(kgnorm/graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

FHIR_CODE_SYSTEMS = {  # fhir_exporter.py:124-130
    "icd10": "http://hl7.org/fhir/sid/icd-10-cm",
    "snomed": "http://snomed.info/sct",
    "loinc": "http://loinc.org",
    "rxnorm": "http://www.nlm.nih.gov/research/umls/rxnorm",
    "omop": "http://ohdsi.org/omop/concept",
}

VITAL_KEYWORDS = [  # fhir_exporter.py:454
    "blood pressure", "heart rate", "pulse", "temperature",
    "respiratory rate", "oxygen", "weight", "height", "bmi",
]


def _resource_type():
    return (
        F.when(F.col("domain") == "condition", "Condition")
        .when(F.col("domain") == "drug", "MedicationStatement")
        .when(F.col("domain") == "measurement", "Observation")
        .when(F.col("domain") == "procedure", "Procedure")
    )


def _clinical_status():
    """Condition clinicalStatus (fhir_exporter.py:285-291)."""
    return (
        F.when(F.col("temporality") == "historical", "resolved")
        .when(F.col("assertion") == "absent", "inactive")
        .otherwise("active")
    )


def _verification_status():
    """Condition verificationStatus (fhir_exporter.py:293-301)."""
    return (
        F.when(F.col("assertion") == "possible", "provisional")
        .when(F.col("assertion") == "absent", "refuted")
        .when(F.col("confidence") >= 0.9, "confirmed")
        .otherwise("unconfirmed")
    )


def _med_status():
    """MedicationStatement status (fhir_exporter.py:385-389)."""
    return F.when(
        (F.col("assertion") == "absent") | (F.col("temporality") == "historical"),
        "stopped",
    ).otherwise("active")


def _obs_status():
    """Observation status (fhir_exporter.py:452)."""
    return F.when(F.col("confidence") >= 0.9, "final").otherwise("preliminary")


def _obs_category():
    """vital-signs vs laboratory by label keyword (fhir_exporter.py:454-457)."""
    label = F.lower(F.col("concept_name"))
    is_vital = None
    for kw in VITAL_KEYWORDS:
        c = label.contains(kw)
        is_vital = c if is_vital is None else (is_vital | c)
    return F.when(is_vital, "vital-signs").otherwise("laboratory")


def _proc_status():
    """Procedure status (fhir_exporter.py:524-530)."""
    return (
        F.when(F.col("temporality") == "future", "preparation")
        .when(F.col("temporality") == "historical", "completed")
        .otherwise("in-progress")
    )


def fhir_rows(facts: DataFrame) -> DataFrame:
    """Facts → one flattened FHIR-resource row each.

    Output: (conv_id, resource_type, resource_id, status,
    verification_status, category, code_system, code, display,
    subject_ref).  domains without a FHIR mapping (observation/device →
    the reference's ``export_fact`` returns None, :190-192) are dropped.
    """
    typed = facts.withColumn("resource_type", _resource_type()).filter(
        F.col("resource_type").isNotNull()
    )
    status = (
        F.when(F.col("resource_type") == "Condition", _clinical_status())
        .when(F.col("resource_type") == "MedicationStatement", _med_status())
        .when(F.col("resource_type") == "Observation", _obs_status())
        .otherwise(_proc_status())
    )
    verification = F.when(F.col("resource_type") == "Condition", _verification_status())
    category = F.when(F.col("resource_type") == "Observation", _obs_category())
    has_omop = F.col("omop_concept_id").isNotNull() & (F.col("omop_concept_id") > 0)
    code_system = F.when(has_omop, F.lit(FHIR_CODE_SYSTEMS["omop"]))
    code = F.when(has_omop, F.col("omop_concept_id").cast("string")).otherwise(
        F.regexp_replace(F.lower(F.col("concept_name")), " ", "-")
    )
    return typed.select(
        "conv_id",
        "resource_type",
        F.sha2(F.concat_ws("|", F.lit("fhir"), F.col("conv_id"),
                           F.col("resource_type"),
                           F.col("omop_concept_id").cast("string"),
                           F.col("assertion")), 256).alias("resource_id"),
        status.alias("status"),
        verification.alias("verification_status"),
        category.alias("category"),
        code_system.alias("code_system"),
        code.alias("code"),
        F.col("concept_name").alias("display"),
        F.concat(F.lit("Patient/"), F.col("conv_id")).alias("subject_ref"),
    )


def fhir_resources_json(facts: DataFrame) -> DataFrame:
    """Full resource documents as JSON strings (sink path): one
    projection, ``to_json(struct(...))``, no UDF."""
    rows = fhir_rows(facts)
    coding = F.array(F.struct(
        F.coalesce(F.col("code_system"), F.lit("http://hospital.example.org/local")).alias("system"),
        F.col("code").alias("code"),
        F.col("display").alias("display"),
    ))
    body = F.struct(
        F.col("resource_type").alias("resourceType"),
        F.col("resource_id").alias("id"),
        F.col("status").alias("status"),
        F.struct(coding.alias("coding"), F.col("display").alias("text")).alias("code"),
        F.struct(F.col("subject_ref").alias("reference")).alias("subject"),
    )
    return rows.select(
        "conv_id", "resource_type", "resource_id",
        F.to_json(body).alias("resource_json"),
    )


_RESOURCE_SCHEMA = (
    "resourceType string, id string, status string,"
    " code struct<coding: array<struct<system: string, code: string, display: string>>, text: string>,"
    " subject struct<reference: string>"
)

_DOMAIN_FROM_TYPE = {
    "Condition": "condition",
    "MedicationStatement": "drug",
    "Observation": "measurement",
    "Procedure": "procedure",
}


def import_facts(resources: DataFrame, json_col: str = "resource_json") -> DataFrame:
    """FHIR resources (JSON documents, e.g. an NDJSON bulk export read
    with ``spark.read.text``/``json``) → fact rows.

    Port of the parse half of ``backend/app/services/fhir_import.py``
    (the httpx transport + DB writes are infrastructure):

    * first coding wins for (code, display, system); display falls back
      to ``code.text`` (:123-143);
    * Condition assertion: status in (inactive, remission, resolved) →
      absent (:319-328); MedicationStatement: active → present, else
      absent (:391-394); other types → present;
    * ``omop_concept_id`` = the code when numeric, else 0 (:337);
    * patient id from ``subject.reference`` ('Patient/<id>').

    One projection, ``from_json`` — no UDF, no shuffle.
    """
    parsed = resources.select(F.from_json(F.col(json_col), _RESOURCE_SCHEMA).alias("r"))
    coding0 = F.col("r.code.coding")[0]
    domain = F.create_map(
        *[F.lit(x) for kv in _DOMAIN_FROM_TYPE.items() for x in kv]
    )[F.col("r.resourceType")]
    display = F.coalesce(coding0["display"], F.col("r.code.text"))
    assertion = (
        F.when(
            (F.col("r.resourceType") == "Condition")
            & F.col("r.status").isin("inactive", "remission", "resolved"),
            "absent",
        )
        .when(
            (F.col("r.resourceType") == "MedicationStatement") & (F.col("r.status") != "active"),
            "absent",
        )
        .otherwise("present")
    )
    return (
        parsed.filter(domain.isNotNull() & display.isNotNull())
        .select(
            F.regexp_replace(F.col("r.subject.reference"), "^Patient/", "").alias("conv_id"),
            domain.alias("domain"),
            F.when(coding0["code"].rlike("^[0-9]+$"), coding0["code"].cast("bigint"))
            .otherwise(F.lit(0)).alias("omop_concept_id"),
            display.alias("concept_name"),
            assertion.alias("assertion"),
            F.lit("current").alias("temporality"),
            F.lit("patient").alias("experiencer"),
            F.lit(1.0).alias("confidence"),
        )
    )


def fhir_bundle(facts: DataFrame) -> DataFrame:
    """Per-conversation Bundle (fhir_exporter.py:194-233): Patient
    resource + fact resources, entry count.  Grouped collect over the
    conversation key — the bundle is per patient, so the group is small
    and the shuffle is on the natural partitioning key."""
    res = fhir_resources_json(facts)
    return (
        res.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_resources"),
            F.sort_array(F.collect_list("resource_json")).alias("entries"),
        )
        .select(
            "conv_id",
            F.sha2(F.concat(F.lit("bundle|"), F.col("conv_id")), 256).alias("bundle_id"),
            F.lit("collection").alias("bundle_type"),
            (F.col("n_resources") + 1).alias("total"),  # + Patient resource
            "entries",
        )
    )
