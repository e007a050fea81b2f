"""HL7 v2.x source connector: pipe-delimited message files → typed
SourceRecord DataFrames.

Port of ``backend/app/connectors/hl7v2_connector.py``:

* message splitting on MSH boundaries (:283-306), segment/field/
  component parsing with the MSH field-1-is-the-separator fixup
  (:108-131);
* PID → SourcePatient (:415-474), PV1 → SourceVisit (:476-527),
  DG1 → SourceCondition (:529-579), RXA → SourceDrug (:581-634),
  PR1 → SourceProcedure (:636-679), OBX → SourceMeasurement
  (:681-761), AL1 → allergies (:763-803);
* default code systems: DG1 ICD10CM unless DG1-2 == 'I9' (:550-555),
  RXA 'RxNorm', PR1 'CPT4', OBX 'LOINC'.

PRESERVED REFERENCE DEFECTS (parity before polish, both pinned by
tests):

* ``_parse_hl7_datetime`` (:347-368) truncates the input to
  ``len(fmt.replace('%',''))`` characters before strptime — 6/5/3/8
  chars, none of which any format can parse — so EVERY HL7 date in the
  reference comes back None.  ``faithful_dates=True`` (default)
  reproduces that; ``faithful_dates=False`` parses
  YYYYMMDD[HHMM[SS[.f]]] properly after stripping the timezone suffix.
* repeated-segment code fields are read from the FIRST segment
  occurrence: ``get_components`` has no segment-index argument
  (:179-187), so DG1-3 / RXA-5 / PR1-3 / OBX-3 / OBX-6 / AL1-3 always
  come from occurrence 0 even while dates/values/ranges use
  occurrence i (:545, :604, :649, :700, :719, :774).

Spark-first: one ``spark.read.text(wholetext)`` scan; message split,
segment split, field split, component extraction and every typed map
are higher-order JVM expressions (``filter``/``transform``/``get``) —
no Python in the parse path.  At lake scale, wholetext reads are
per-file tasks; shard message batches across many files (the standard
HL7 feed layout) and parallelism follows the file count.

The reference's cross-message first-wins dedup for patients/visits
(:416, :480 ``seen_*`` sets) follows Python iteration order —
nondeterministic under distribution; the deterministic stand-in is
min-by message-control-id, documented here and in the tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

_TS_FORMATS = ["yyyyMMddHHmmss.SSS", "yyyyMMddHHmmss", "yyyyMMddHHmm", "yyyyMMdd"]


def read_messages(spark: SparkSession, path: str) -> DataFrame:
    """One row per HL7 message: ``segs`` array<array<string>> plus the
    MSH-derived header columns."""
    files = spark.read.text(path, wholetext=True)
    raw = files.select(
        F.explode(F.split(F.col("value"), r"(?=MSH\|)")).alias("raw")
    ).select(F.trim("raw").alias("raw")).filter(F.col("raw").startswith("MSH"))

    norm = F.regexp_replace(F.regexp_replace(F.col("raw"), "\r\n", "\r"), "\n", "\r")
    lines = F.filter(
        F.transform(F.split(norm, "\r"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )
    # MSH's field 1 IS the separator (hl7v2_connector.py:127-129)
    segs = F.transform(
        lines,
        lambda line: F.when(
            line.startswith("MSH"),
            F.concat(
                F.array(F.lit("MSH"), F.lit("|")),
                F.slice(F.split(line, r"\|"), 2, 100000),
            ),
        ).otherwise(F.split(line, r"\|")),
    )
    m = raw.select(segs.alias("segs"))
    msh = F.get(F.filter(F.col("segs"), lambda s: F.get(s, 0) == "MSH"), 0)
    return m.select(
        "segs",
        _fld(msh, 9).alias("message_type"),
        _fld(msh, 10).alias("message_control_id"),
        _fld(msh, 4).alias("sending_facility"),
    )


def _fld(seg, n):
    """Field n of a segment array (1-based HL7 numbering; '' → NULL,
    hl7v2_connector.py:145-177)."""
    v = F.get(seg, n)
    return F.when((v.isNotNull()) & (v != ""), v)


def _comp(field_col, c):
    """Component c (1-based) of a field ('' → NULL, :179-187)."""
    v = F.get(F.split(field_col, r"\^"), c - 1)
    return F.when((v.isNotNull()) & (v != ""), v)


def _segs_of(seg_id: str):
    return F.filter(F.col("segs"), lambda s: F.get(s, 0) == seg_id)


def _first_seg(seg_id: str):
    return F.get(_segs_of(seg_id), 0)


def _patient_id():
    """PID-3 first component (:396-404)."""
    return _comp(_fld(_first_seg("PID"), 3), 1)


def _visit_id():
    """PV1-19 (:406-409)."""
    return _fld(_first_seg("PV1"), 19)


def _hl7_ts(col, faithful: bool):
    if faithful:
        # reference _parse_hl7_datetime can never succeed (see module
        # docstring) — every date is None
        return F.lit(None).cast("timestamp")
    stripped = F.get(F.split(col, "[+-]"), 0)
    return F.coalesce(*[F.try_to_timestamp(stripped, F.lit(f)) for f in _TS_FORMATS])


def hl7_patients(msgs: DataFrame, source_system: str = "hl7v2",
                 faithful_dates: bool = True) -> DataFrame:
    """PID segments → SourcePatient (:415-474), first message per
    patient id (min message_control_id as the deterministic stand-in
    for the reference's iteration-order ``seen_patients`` set)."""
    pid = _first_seg("PID")
    name = _fld(pid, 5)
    addr = _fld(pid, 11)
    base = msgs.filter(pid.isNotNull()).select(
        "message_control_id",
        _patient_id().alias("source_id"),
        F.lit(source_system).alias("source_system"),
        _comp(name, 2).alias("given_name"),
        _comp(name, 1).alias("family_name"),
        _hl7_ts(_fld(pid, 7), faithful_dates).cast("date").alias("birth_date"),
        F.when(F.upper(_fld(pid, 8)) == "M", "male")
        .when(F.upper(_fld(pid, 8)) == "F", "female")
        .when(F.upper(_fld(pid, 8)) == "O", "other")
        .otherwise("unknown").alias("gender"),
        _comp(_fld(pid, 10), 1).alias("race"),
        _patient_id().alias("mrn"),
        _comp(addr, 1).alias("address_line1"),
        _comp(addr, 3).alias("city"),
        _comp(addr, 4).alias("state"),
        _comp(addr, 5).alias("postal_code"),
        _comp(_fld(pid, 13), 1).alias("phone"),
        (F.coalesce(_fld(pid, 30).isin("Y", "1", "true"), F.lit(False))
         | _hl7_ts(_fld(pid, 29), faithful_dates).isNotNull()).alias("deceased"),
        _hl7_ts(_fld(pid, 29), faithful_dates).cast("date").alias("death_date"),
    ).filter(F.col("source_id").isNotNull())
    w = Window.partitionBy("source_id").orderBy("message_control_id")
    return (
        base.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1).drop("_rk", "message_control_id")
    )


def hl7_visits(msgs: DataFrame, source_system: str = "hl7v2",
               faithful_dates: bool = True) -> DataFrame:
    """PV1 segments → SourceVisit (:476-527)."""
    pv1 = _first_seg("PV1")
    attending = _fld(pv1, 7)
    cls = F.upper(_fld(pv1, 2))
    base = msgs.filter(pv1.isNotNull()).select(
        "message_control_id",
        F.coalesce(_visit_id(), F.col("message_control_id")).alias("source_id"),
        F.lit(source_system).alias("source_system"),
        F.coalesce(_patient_id(), F.lit("")).alias("patient_source_id"),
        F.when(cls.isin("I", "INPATIENT"), "inpatient")
        .when(cls.isin("O", "OUTPATIENT"), "outpatient")
        .when(cls.isin("E", "EMERGENCY"), "emergency")
        .otherwise("unknown").alias("visit_type"),
        _hl7_ts(_fld(pv1, 44), faithful_dates).alias("start_datetime"),
        _hl7_ts(_fld(pv1, 45), faithful_dates).alias("end_datetime"),
        F.col("sending_facility").alias("facility_name"),
        _fld(pv1, 3).alias("department"),
        _comp(attending, 1).alias("attending_provider_id"),
        F.when(
            F.size(F.split(attending, r"\^")) > 2,
            F.concat_ws(" ", _comp(attending, 3), _comp(attending, 2)),
        ).alias("attending_provider_name"),
    ).filter(F.col("source_id").isNotNull())
    w = Window.partitionBy("source_id").orderBy("message_control_id")
    return (
        base.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1).drop("_rk", "message_control_id")
    )


def _exploded(msgs: DataFrame, seg_id: str) -> DataFrame:
    """(per-message columns, i, seg) for every occurrence of seg_id,
    plus ``seg0`` — the FIRST occurrence, from which the reference
    reads all code fields (get_components has no index arg)."""
    return msgs.select(
        "message_control_id",
        F.coalesce(_patient_id(), F.lit("")).alias("patient_source_id"),
        _visit_id().alias("visit_source_id"),
        _first_seg(seg_id).alias("seg0"),
        F.posexplode(_segs_of(seg_id)).alias("i", "seg"),
    )


def hl7_conditions(msgs: DataFrame, source_system: str = "hl7v2",
                   faithful_dates: bool = True) -> DataFrame:
    """DG1 segments → SourceCondition (:529-579)."""
    e = _exploded(msgs, "DG1")
    code = _comp(_fld(F.col("seg0"), 3), 1)
    display = _comp(_fld(F.col("seg0"), 3), 2)
    sys3 = _comp(_fld(F.col("seg0"), 3), 3)
    coding_method = _fld(F.col("seg"), 2)
    code_system = F.coalesce(
        sys3, F.when(coding_method == "I9", "ICD9CM").otherwise("ICD10CM")
    )
    return e.select(
        F.concat_ws("-", "message_control_id", F.lit("DG1"), "i").alias("source_id"),
        F.lit(source_system).alias("source_system"),
        "patient_source_id", "visit_source_id",
        code.alias("code"),
        code_system.alias("code_system"),
        display.alias("display_text"),
        F.lit("active").alias("status"),
        _hl7_ts(_fld(F.col("seg"), 5), faithful_dates).alias("onset_datetime"),
        _fld(F.col("seg"), 6).alias("category"),
    ).filter(F.col("code").isNotNull())


def hl7_drugs(msgs: DataFrame, source_system: str = "hl7v2",
              faithful_dates: bool = True) -> DataFrame:
    """RXA segments → SourceDrug (:581-634)."""
    e = _exploded(msgs, "RXA")
    code = _comp(_fld(F.col("seg0"), 5), 1)
    display = _comp(_fld(F.col("seg0"), 5), 2)
    sys5 = _comp(_fld(F.col("seg0"), 5), 3)
    return e.select(
        F.concat_ws("-", "message_control_id", F.lit("RXA"), "i").alias("source_id"),
        F.lit(source_system).alias("source_system"),
        "patient_source_id", "visit_source_id",
        code.alias("code"),
        F.coalesce(sys5, F.lit("RxNorm")).alias("code_system"),
        display.alias("display_text"),
        F.lit("active").alias("status"),
        _hl7_ts(_fld(F.col("seg"), 3), faithful_dates).alias("start_datetime"),
        _hl7_ts(_fld(F.col("seg"), 4), faithful_dates).alias("end_datetime"),
        _fld(F.col("seg"), 6).try_cast("double").alias("dose_value"),
        _comp(_fld(F.col("seg"), 7), 1).alias("dose_unit"),
        _fld(F.col("seg"), 9).alias("sig"),
    ).filter(F.col("display_text").isNotNull() | F.col("code").isNotNull())


def hl7_procedures(msgs: DataFrame, source_system: str = "hl7v2",
                   faithful_dates: bool = True) -> DataFrame:
    """PR1 segments → SourceProcedure (:636-679)."""
    e = _exploded(msgs, "PR1")
    code = _comp(_fld(F.col("seg0"), 3), 1)
    display = _comp(_fld(F.col("seg0"), 3), 2)
    sys3 = _comp(_fld(F.col("seg0"), 3), 3)
    surgeon = _fld(F.col("seg0"), 11)
    return e.select(
        F.concat_ws("-", "message_control_id", F.lit("PR1"), "i").alias("source_id"),
        F.lit(source_system).alias("source_system"),
        "patient_source_id", "visit_source_id",
        code.alias("code"),
        F.coalesce(sys3, F.lit("CPT4")).alias("code_system"),
        display.alias("display_text"),
        _hl7_ts(_fld(F.col("seg"), 5), faithful_dates).alias("performed_datetime"),
        _comp(surgeon, 1).alias("performer_id"),
        F.when(
            F.size(F.split(surgeon, r"\^")) > 2,
            F.concat_ws(" ", _comp(surgeon, 3), _comp(surgeon, 2)),
        ).alias("performer_name"),
    ).filter(F.col("code").isNotNull() | F.col("display_text").isNotNull())


def hl7_measurements(msgs: DataFrame, source_system: str = "hl7v2",
                     faithful_dates: bool = True) -> DataFrame:
    """OBX segments → SourceMeasurement (:681-761)."""
    e = msgs.select(
        "message_control_id",
        F.coalesce(_patient_id(), F.lit("")).alias("patient_source_id"),
        _visit_id().alias("visit_source_id"),
        _first_seg("OBX").alias("seg0"),
        _hl7_ts(_fld(_first_seg("OBR"), 7), faithful_dates).alias("obr_dt"),
        F.posexplode(_segs_of("OBX")).alias("i", "seg"),
    )
    code = _comp(_fld(F.col("seg0"), 3), 1)
    display = _comp(_fld(F.col("seg0"), 3), 2)
    sys3 = _comp(_fld(F.col("seg0"), 3), 3)
    unit = _comp(_fld(F.col("seg0"), 6), 1)
    vtype = _fld(F.col("seg"), 2)
    value = _fld(F.col("seg"), 5)
    num = value.try_cast("double")
    # NM + parseable → numeric; NM + unparseable → text; non-NM → text
    value_numeric = F.when(vtype == "NM", num)
    value_text = F.when((vtype == "NM") & num.isNull(), value) \
        .when(vtype != "NM", value)
    rng = _fld(F.col("seg"), 7)
    has_range = rng.contains("-")
    rlow = F.when(has_range, F.get(F.split(rng, "-"), 0).try_cast("double"))
    rhigh = F.when(has_range, F.get(F.split(rng, "-"), 1).try_cast("double"))
    # both must parse or both are dropped (the reference assigns inside
    # one try block, :726-733)
    both = rlow.isNotNull() & rhigh.isNotNull()
    return e.select(
        F.concat_ws("-", "message_control_id", F.lit("OBX"), "i").alias("source_id"),
        F.lit(source_system).alias("source_system"),
        "patient_source_id", "visit_source_id",
        code.alias("code"),
        F.coalesce(sys3, F.lit("LOINC")).alias("code_system"),
        display.alias("display_text"),
        value_numeric.alias("value_numeric"),
        value_text.alias("value_text"),
        unit.alias("unit"),
        F.when(both, rlow).alias("range_low"),
        F.when(both, rhigh).alias("range_high"),
        _fld(F.col("seg"), 8).alias("interpretation"),
        F.coalesce(_hl7_ts(_fld(F.col("seg"), 14), faithful_dates),
                   F.col("obr_dt")).alias("effective_datetime"),
    ).filter(F.col("code").isNotNull() | F.col("display_text").isNotNull())


def hl7_allergies(msgs: DataFrame, source_system: str = "hl7v2") -> DataFrame:
    """AL1 segments → allergy observations (:763-803)."""
    e = _exploded(msgs, "AL1")
    code = _comp(_fld(F.col("seg0"), 3), 1)
    display = _comp(_fld(F.col("seg0"), 3), 2)
    return e.select(
        F.concat_ws("-", "message_control_id", F.lit("AL1"), "i").alias("source_id"),
        F.lit(source_system).alias("source_system"),
        "patient_source_id", "visit_source_id",
        code.alias("code"),
        F.when(display.isNotNull(),
               F.concat(F.lit("Allergy: "), display)).alias("display_text"),
        F.lit("allergy").alias("category"),
        _fld(F.col("seg"), 4).alias("criticality"),
        _fld(F.col("seg"), 5).alias("reaction"),
    ).filter(F.col("display_text").isNotNull())
