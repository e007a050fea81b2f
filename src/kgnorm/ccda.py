"""C-CDA document connector: clinical-document XML → typed SourceRecord
DataFrames.

Port of ``backend/app/connectors/ccda_connector.py``:

* section lookup by templateId OID (:69-81, :271-284);
* patient demographics from recordTarget (:301-395) — MRN = first
  patientRole id whose root is not the SSN OID (:378-386), patient id =
  'root^extension' (:301-314);
* problems (:473-535): act/entryRelationship/observation, value code
  with translation fallback, statusCode completed→resolved /
  aborted→inactive;
* medications (:537-613): substanceAdministration, manufacturedMaterial
  code, doseQuantity, routeCode display-then-code, completed→completed /
  aborted→stopped;
* vitals (:615-662) and lab results (:664-750): organizer/component
  observations, PQ numeric vs ST/CD text values, reference ranges,
  interpretation codes;
* code_system = codeSystemName falling back to the raw codeSystem OID
  (:521-523), measurements default 'LOINC' (:650, :735).

PRESERVED REFERENCE DEFECT (pinned by tests): ``_parse_date``
(:212-248) truncates to ``len(fmt.replace('%',''))`` chars before
strptime — 8/6/5/3/2/1 chars, none parseable — so every C-CDA date is
None.  ``faithful_dates=True`` (default) reproduces that;
``faithful_dates=False`` parses HL7 TS properly.

Spark-first: one ``spark.read.text(wholetext=True)`` scan (the
document-per-file layout C-CDA ships in; parallelism = file count) and
a single ``from_xml`` against an EXPLICIT ClinicalDocument schema —
section dispatch, entry explosion and attribute extraction are all
higher-order JVM expressions.  The reference DOM-parses each document
with ElementTree on one thread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

SECTION_TEMPLATE_IDS = {  # ccda_connector.py:69-81
    "problems": "2.16.840.1.113883.10.20.22.2.5.1",
    "medications": "2.16.840.1.113883.10.20.22.2.1.1",
    "allergies": "2.16.840.1.113883.10.20.22.2.6.1",
    "vital_signs": "2.16.840.1.113883.10.20.22.2.4.1",
    "results": "2.16.840.1.113883.10.20.22.2.3.1",
    "procedures": "2.16.840.1.113883.10.20.22.2.7.1",
    "encounters": "2.16.840.1.113883.10.20.22.2.22.1",
}

_SSN_OID = "2.16.840.1.113883.4.1"

_CODE = T.StructType([
    T.StructField("_code", T.StringType()),
    T.StructField("_codeSystem", T.StringType()),
    T.StructField("_codeSystemName", T.StringType()),
    T.StructField("_displayName", T.StringType()),
    T.StructField("translation", T.StructType([
        T.StructField("_code", T.StringType()),
        T.StructField("_codeSystem", T.StringType()),
        T.StructField("_codeSystemName", T.StringType()),
        T.StructField("_displayName", T.StringType()),
    ])),
])
_TS = T.StructType([T.StructField("_value", T.StringType())])
_IVL = T.StructType([
    T.StructField("_value", T.StringType()),
    T.StructField("low", _TS),
    T.StructField("high", _TS),
])
_VALUE = T.StructType([
    T.StructField("_code", T.StringType()),
    T.StructField("_codeSystem", T.StringType()),
    T.StructField("_codeSystemName", T.StringType()),
    T.StructField("_displayName", T.StringType()),
    T.StructField("_value", T.StringType()),
    T.StructField("_unit", T.StringType()),
    T.StructField("_xsi:type", T.StringType()),
    T.StructField("_text", T.StringType()),  # valueTag (see read_documents)
    T.StructField("translation", T.StructType([
        T.StructField("_code", T.StringType()),
        T.StructField("_codeSystem", T.StringType()),
        T.StructField("_codeSystemName", T.StringType()),
        T.StructField("_displayName", T.StringType()),
    ])),
])

_OBSERVATION = T.StructType([
    T.StructField("code", _CODE),
    T.StructField("value", _VALUE),
    T.StructField("effectiveTime", _IVL),
    T.StructField("statusCode", T.StructType([T.StructField("_code", T.StringType())])),
    T.StructField("interpretationCode", _CODE),
    T.StructField("referenceRange", T.StructType([
        T.StructField("observationRange", T.StructType([
            T.StructField("value", _IVL),
        ])),
    ])),
])

_ENTRY = T.StructType([
    T.StructField("act", T.StructType([
        T.StructField("entryRelationship", T.StructType([
            T.StructField("observation", _OBSERVATION),
        ])),
    ])),
    T.StructField("substanceAdministration", T.StructType([
        T.StructField("consumable", T.StructType([
            T.StructField("manufacturedProduct", T.StructType([
                T.StructField("manufacturedMaterial", T.StructType([
                    T.StructField("code", _CODE),
                ])),
            ])),
        ])),
        T.StructField("effectiveTime", _IVL),
        T.StructField("doseQuantity", T.StructType([
            T.StructField("_value", T.StringType()),
            T.StructField("_unit", T.StringType()),
        ])),
        T.StructField("routeCode", _CODE),
        T.StructField("statusCode", T.StructType([T.StructField("_code", T.StringType())])),
    ])),
    T.StructField("organizer", T.StructType([
        T.StructField("code", _CODE),
        T.StructField("effectiveTime", _TS),
        T.StructField("component", T.ArrayType(T.StructType([
            T.StructField("observation", _OBSERVATION),
        ]))),
    ])),
])

DOCUMENT_SCHEMA = T.StructType([
    T.StructField("id", T.StructType([
        T.StructField("_root", T.StringType()),
        T.StructField("_extension", T.StringType()),
    ])),
    T.StructField("recordTarget", T.StructType([
        T.StructField("patientRole", T.StructType([
            T.StructField("id", T.ArrayType(T.StructType([
                T.StructField("_root", T.StringType()),
                T.StructField("_extension", T.StringType()),
            ]))),
            T.StructField("addr", T.StructType([
                T.StructField("streetAddressLine", T.ArrayType(T.StringType())),
                T.StructField("city", T.StringType()),
                T.StructField("state", T.StringType()),
                T.StructField("postalCode", T.StringType()),
                T.StructField("country", T.StringType()),
            ])),
            T.StructField("patient", T.StructType([
                T.StructField("name", T.StructType([
                    T.StructField("given", T.ArrayType(T.StringType())),
                    T.StructField("family", T.StringType()),
                ])),
                T.StructField("administrativeGenderCode",
                              T.StructType([T.StructField("_code", T.StringType())])),
                T.StructField("birthTime", _TS),
                T.StructField("raceCode", _CODE),
                T.StructField("ethnicGroupCode", _CODE),
            ])),
        ])),
    ])),
    T.StructField("component", T.StructType([
        T.StructField("structuredBody", T.StructType([
            T.StructField("component", T.ArrayType(T.StructType([
                T.StructField("section", T.StructType([
                    T.StructField("templateId", T.ArrayType(T.StructType([
                        T.StructField("_root", T.StringType()),
                    ]))),
                    T.StructField("entry", T.ArrayType(_ENTRY)),
                ])),
            ]))),
        ])),
    ])),
])


def read_documents(spark: SparkSession, path: str,
                   per_line: bool = False) -> DataFrame:
    """One row per C-CDA document: ``doc`` struct + ``patient_id``.

    ``per_line=False`` (default) reads document-per-FILE — how C-CDA
    ships from EHR exports; parallelism = file count.  ``per_line=True``
    reads newline-delimited single-line XML documents — the splittable
    lake layout to re-shard exports into at 100-TB scale (no tiny-file
    problem, byte-range splits)."""
    files = spark.read.text(path, wholetext=not per_line)
    if per_line:
        files = files.filter(F.length(F.trim("value")) > 0)
    # valueTag renamed: Spark's default '_VALUE' collides with the HL7
    # '_value' attribute under case-insensitive field resolution
    d = files.select(
        F.from_xml("value", DOCUMENT_SCHEMA, {"valueTag": "_text"}).alias("doc"))
    pid0 = F.col("doc")["recordTarget"]["patientRole"]["id"][0]
    patient_id = F.when(
        pid0["_extension"].isNotNull(),
        F.concat(F.coalesce(pid0["_root"], F.lit("")), F.lit("^"), pid0["_extension"]),
    ).otherwise(F.coalesce(pid0["_root"],
                           F.concat(F.lit("patient_"), F.col("doc")["id"]["_root"])))
    return d.select("doc", patient_id.alias("patient_id"))


def _ccda_ts(col, faithful: bool):
    if faithful:
        # the reference's _parse_date never succeeds (module docstring)
        return F.lit(None).cast("timestamp")
    stripped = F.regexp_replace(col, r"[+-]\d{4}$", "")
    return F.coalesce(*[
        F.try_to_timestamp(stripped, F.lit(f))
        for f in ("yyyyMMddHHmmss.SSS", "yyyyMMddHHmmss", "yyyyMMddHHmm", "yyyyMMdd")
    ])


def _section(name: str):
    oid = SECTION_TEMPLATE_IDS[name]
    comps = F.col("doc")["component"]["structuredBody"]["component"]
    match = F.filter(
        comps,
        lambda c: F.exists(c["section"]["templateId"], lambda t: t["_root"] == oid),
    )
    return F.get(match, 0)["section"]


def _code_fields(code_col):
    """code / code_system / display with the translation fallback for
    the CODE itself (:493-496) — system prefers codeSystemName (:521)."""
    has = code_col["_code"].isNotNull()
    t = code_col["translation"]
    return (
        F.when(has, code_col["_code"]).otherwise(t["_code"]),
        F.when(has, F.coalesce(code_col["_codeSystemName"], code_col["_codeSystem"]))
        .otherwise(F.coalesce(t["_codeSystemName"], t["_codeSystem"])),
        F.when(has, code_col["_displayName"]).otherwise(t["_displayName"]),
    )


def ccda_patients(docs: DataFrame, source_system: str = "ccda") -> DataFrame:
    """recordTarget demographics → SourcePatient (:316-395)."""
    role = F.col("doc")["recordTarget"]["patientRole"]
    pat = role["patient"]
    g = pat["administrativeGenderCode"]["_code"]
    mrn = F.get(F.filter(
        role["id"],
        lambda i: (~F.upper(F.coalesce(i["_root"], F.lit(""))).contains(_SSN_OID))
        | F.upper(F.coalesce(i["_root"], F.lit(""))).contains("MRN"),
    ), 0)["_extension"]
    return docs.select(
        F.col("patient_id").alias("source_id"),
        F.lit(source_system).alias("source_system"),
        mrn.alias("mrn"),
        F.array_join(pat["name"]["given"], " ").alias("given_name"),
        pat["name"]["family"].alias("family_name"),
        # faithful: birth dates never parse in the reference
        F.lit(None).cast("date").alias("birth_date"),
        F.when(g == "M", "male").when(g == "F", "female")
        .when(g == "UN", "other").otherwise("unknown").alias("gender"),
        pat["raceCode"]["_displayName"].alias("race"),
        pat["ethnicGroupCode"]["_displayName"].alias("ethnicity"),
        role["addr"]["streetAddressLine"][0].alias("address_line1"),
        role["addr"]["city"].alias("city"),
        role["addr"]["state"].alias("state"),
        role["addr"]["postalCode"].alias("postal_code"),
        role["addr"]["country"].alias("country"),
    )


def ccda_conditions(docs: DataFrame, source_system: str = "ccda",
                    faithful_dates: bool = True) -> DataFrame:
    """Problems section → SourceCondition (:473-535)."""
    e = docs.select(
        "patient_id",
        F.posexplode(_section("problems")["entry"]).alias("i", "entry"),
    ).filter(F.col("entry")["act"].isNotNull())
    obs = F.col("entry")["act"]["entryRelationship"]["observation"]
    code, system, display = _code_fields(obs["value"])
    status_code = obs["statusCode"]["_code"]
    return e.filter(obs.isNotNull()).select(
        F.concat(F.col("patient_id"), F.lit("_prob_"), F.col("i")).alias("source_id"),
        F.lit(source_system).alias("source_system"),
        F.col("patient_id").alias("patient_source_id"),
        code.alias("code"),
        system.alias("code_system"),
        display.alias("display_text"),
        F.when(status_code == "completed", "resolved")
        .when(status_code == "aborted", "inactive")
        .otherwise("active").alias("status"),
        _ccda_ts(obs["effectiveTime"]["low"]["_value"], faithful_dates)
        .alias("onset_datetime"),
        _ccda_ts(obs["effectiveTime"]["high"]["_value"], faithful_dates)
        .alias("abatement_datetime"),
    )


def ccda_drugs(docs: DataFrame, source_system: str = "ccda",
               faithful_dates: bool = True) -> DataFrame:
    """Medications section → SourceDrug (:537-613)."""
    e = docs.select(
        "patient_id",
        F.posexplode(_section("medications")["entry"]).alias("i", "entry"),
    )
    sa = F.col("entry")["substanceAdministration"]
    mat = sa["consumable"]["manufacturedProduct"]["manufacturedMaterial"]["code"]
    code, system, display = _code_fields(mat)
    status_code = sa["statusCode"]["_code"]
    eff = sa["effectiveTime"]
    return e.filter(sa.isNotNull()).select(
        F.concat(F.col("patient_id"), F.lit("_med_"), F.col("i")).alias("source_id"),
        F.lit(source_system).alias("source_system"),
        F.col("patient_id").alias("patient_source_id"),
        code.alias("code"),
        system.alias("code_system"),
        display.alias("display_text"),
        F.when(status_code == "completed", "completed")
        .when(status_code == "aborted", "stopped")
        .otherwise("active").alias("status"),
        _ccda_ts(F.coalesce(eff["low"]["_value"], eff["_value"]), faithful_dates)
        .alias("start_datetime"),
        _ccda_ts(eff["high"]["_value"], faithful_dates).alias("end_datetime"),
        sa["doseQuantity"]["_value"].try_cast("double").alias("dose_value"),
        sa["doseQuantity"]["_unit"].alias("dose_unit"),
        F.coalesce(sa["routeCode"]["_displayName"], sa["routeCode"]["_code"])
        .alias("route"),
    )


def _organizer_measurements(docs: DataFrame, section: str, kind: str,
                            faithful_dates: bool) -> DataFrame:
    e = docs.select(
        "patient_id",
        F.posexplode(_section(section)["entry"]).alias("oi", "entry"),
    ).filter(F.col("entry")["organizer"].isNotNull())
    comps = e.select(
        "patient_id", "oi",
        F.col("entry")["organizer"]["effectiveTime"]["_value"].alias("org_time"),
        F.posexplode(F.col("entry")["organizer"]["component"]).alias("ci", "comp"),
    )
    obs = F.col("comp")["observation"]
    code = obs["code"]
    v = obs["value"]
    xsi = F.coalesce(v["_xsi:type"], F.lit(""))
    is_pq = xsi.contains("PQ")
    is_text = xsi.contains("ST") | xsi.contains("CD")
    num = v["_value"].try_cast("double")
    rng = obs["referenceRange"]["observationRange"]["value"]
    return comps.select(
        F.concat(F.col("patient_id"), F.lit(f"_{kind}_"), F.col("oi"),
                 F.lit("_"), F.col("ci")).alias("source_id"),
        F.lit("ccda").alias("source_system"),
        F.col("patient_id").alias("patient_source_id"),
        code["_code"].alias("code"),
        F.coalesce(code["_codeSystemName"], F.lit("LOINC")).alias("code_system"),
        code["_displayName"].alias("display_text"),
        # vitals take the raw value as numeric (:652); results only for
        # PQ, with text fallback on parse failure (:692-703)
        (F.when(is_pq | (F.lit(kind) == "vital"), num)).alias("value_numeric"),
        F.when(is_pq & num.isNull(), v["_value"])
        .when(is_text, F.coalesce(v["_text"], v["_displayName"]))
        .alias("value_text"),
        v["_unit"].alias("unit"),
        rng["low"]["_value"].try_cast("double").alias("range_low"),
        rng["high"]["_value"].try_cast("double").alias("range_high"),
        obs["interpretationCode"]["_code"].alias("interpretation"),
        _ccda_ts(F.coalesce(obs["effectiveTime"]["_value"], F.col("org_time")),
                 faithful_dates).alias("effective_datetime"),
    )


def ccda_vitals(docs: DataFrame, faithful_dates: bool = True) -> DataFrame:
    """Vital Signs section → SourceMeasurement (:615-662)."""
    return _organizer_measurements(docs, "vital_signs", "vital", faithful_dates) \
        .drop("value_text", "range_low", "range_high", "interpretation")


def ccda_lab_results(docs: DataFrame, faithful_dates: bool = True) -> DataFrame:
    """Results section → SourceMeasurement (:664-750)."""
    return _organizer_measurements(docs, "results", "lab", faithful_dates)
