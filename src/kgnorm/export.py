"""OMOP CDM NOTE / NOTE_NLP export projections.

Reference: backend/app/services/export/omop_exporter.py:24-215 and
omop_exporter_db.py:33-182 (spec specs/omop_export.md): documents
project to NOTE rows, mentions + their best (min-rank) candidate project
to NOTE_NLP rows; ``assertion → term_exists`` maps 'absent' → 'N' else
'Y' (negated findings are exported, never dropped — the
negation-preservation invariant), ``temporality → term_temporal``
passes through.

The reference derives deterministic integer export ids by hashing
(omop_exporter_db.py:33-77); we use md5 hex strings of the natural keys
(stable, collision-safe, engine-portable) — a downstream CDM loader can
bucket them to ints if required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def note_export(transcripts: DataFrame) -> DataFrame:
    """Transcript turns → OMOP NOTE rows (omop_exporter_db.py:92-114)."""
    return transcripts.select(
        F.md5(F.concat_ws("|", "conv_id", F.col("turn_idx").cast("string"))).alias("note_id"),
        F.md5(F.col("conv_id")).alias("person_id"),
        F.col("conv_id"),
        F.col("turn_idx"),
        F.date_format("ts", "yyyy-MM-dd").alias("note_date"),
        F.lit("conversation_turn").alias("note_class"),
        F.col("text").alias("note_text"),
    )


def note_nlp_export(mentions: DataFrame, top_candidates: DataFrame) -> DataFrame:
    """Mentions + best candidate → NOTE_NLP rows (omop_exporter_db.py:116-205).

    Best candidate = min rank (:182-205); mentions without a candidate are
    skipped; ``term_exists``: 'N' for absent else 'Y'
    (omop_exporter.py:183-198).
    """
    key = ["conv_id", "turn_idx", "start_offset", "end_offset"]
    cand = top_candidates.select(*key, "omop_concept_id", "concept_name")
    m = mentions.drop("omop_concept_id")
    joined = m.join(cand, key)
    return joined.select(
        F.md5(F.concat_ws("|", "conv_id", F.col("turn_idx").cast("string"),
                          F.col("start_offset").cast("string"),
                          F.col("end_offset").cast("string"))).alias("note_nlp_id"),
        F.md5(F.concat_ws("|", "conv_id", F.col("turn_idx").cast("string"))).alias("note_id"),
        "conv_id",
        "turn_idx",
        F.col("start_offset").alias("offset_start"),
        F.col("end_offset").alias("offset_end"),
        F.col("mention_text").alias("lexical_variant"),
        F.col("omop_concept_id").alias("note_nlp_concept_id"),
        F.when(F.col("assertion") == "absent", F.lit("N")).otherwise(F.lit("Y")).alias("term_exists"),
        F.col("temporality").alias("term_temporal"),
        F.col("section").alias("section_concept"),
    )


def write_export(notes: DataFrame, note_nlp: DataFrame, out_dir: str, fmt: str = "csv") -> None:
    """Materialize the export (CSV or JSON sink, specs/omop_export.md:60-104)."""
    for name, df in (("note", notes), ("note_nlp", note_nlp)):
        w = df.write.mode("overwrite")
        if fmt == "csv":
            w.option("header", "true").csv(f"{out_dir}/{name}")
        else:
            w.json(f"{out_dir}/{name}")
