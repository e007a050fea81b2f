"""Deterministic synthetic transcripts (fixtures + scaled benchmark input).

The north rule's input is an Iceberg table of conversation transcripts
``(conv_id, turn_idx, role, text, tool, ts)``; no external data is
allowed, so this module synthesizes it deterministically:

* :func:`golden_transcripts` — the reference's 10 golden synthetic notes
  (fixtures/synthetic_notes.json, ported to data/synthetic_notes.json)
  as one conversation per patient, one turn per note.  Their
  ``expected_mentions`` drive the parity tests (SURVEY §5).
* :func:`synth_transcripts` — an arbitrarily large transcripts table
  generated DISTRIBUTED (``spark.range`` + column expressions, no driver
  materialization, no Python UDF): turn text cycles through the 10 note
  templates, so expected pipeline output is exactly known at any scale.
  Seedless and deterministic: row ``i`` is always the same turn.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from kgnorm import schemas
from kgnorm.ontology import DATA_DIR


def load_golden_notes(data_dir: str | None = None) -> list[dict]:
    with open(os.path.join(data_dir or DATA_DIR, "synthetic_notes.json")) as f:
        return json.load(f)["notes"]


def note_templates(data_dir: str | None = None) -> list[str]:
    return [n["text"] for n in load_golden_notes(data_dir)]


def golden_transcripts(spark: SparkSession, data_dir: str | None = None) -> DataFrame:
    """10 golden notes → transcripts rows (conv per patient, turn 0)."""
    import datetime as dt

    rows = []
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    for i, note in enumerate(load_golden_notes(data_dir)):
        rows.append({
            "conv_id": note["patient_id"],
            "turn_idx": 0,
            "role": "user",
            "text": note["text"],
            "tool": "",
            "ts": base + dt.timedelta(minutes=i),
        })
    return spark.createDataFrame(rows, schema=schemas.TRANSCRIPTS)


def synth_transcripts(
    spark: SparkSession,
    n_turns: int,
    turns_per_conv: int = 8,
    data_dir: str | None = None,
    unique_texts: bool = False,
    hot_frac: float = 0.0,
    hot_template: int = 0,
) -> DataFrame:
    """Distributed deterministic transcripts of ``n_turns`` rows.

    Text of row ``i`` is note template ``i % 10`` — the whole table's
    expected extraction is template-periodic, which makes golden
    verification possible at any scale.

    ``unique_texts=True`` appends a per-turn trigger-free marker
    sentence (" Ref Cnnn.") so every row's text is distinct — the
    worst case for the extraction UDF's distinct-text memo; used by the
    memo-off benchmark variant.  The marker contains no dictionary terms
    or context triggers, so per-template extraction semantics are
    unchanged except for offsets-past-end never matching.

    ``hot_frac=f`` overrides the text of fraction ``f`` of rows (spread
    evenly by ``id % 1000``) with template ``hot_template`` — the
    skewed-concept benchmark variant: at f=0.9 the hot template's
    concepts appear in ~91% of turns vs ~1% for each other template,
    i.e. ~100x hotter fact/graph keys on the same row count.
    """
    templates = note_templates(data_dir)
    tarr = F.array(*[F.lit(t) for t in templates])
    roles = F.array(F.lit("user"), F.lit("assistant"))
    text = F.element_at(tarr, (F.pmod(F.col("id"), F.lit(len(templates))) + 1).cast("int"))
    if hot_frac:
        is_hot = F.pmod(F.col("id"), F.lit(1000)) < F.lit(int(round(hot_frac * 1000)))
        text = F.when(is_hot, F.element_at(tarr, F.lit(hot_template + 1))).otherwise(text)
    if unique_texts:
        text = F.concat(text, F.lit(" Ref C"), F.col("id").cast("string"), F.lit("."))
    # r6: 2 partitions per core (range default is 1) — since extraction
    # consumes this table shuffle-free (coalesce cap instead of a
    # repartition), the scan partitioning IS the extraction stage's task
    # granularity, and 2 waves per core absorbs stragglers on a noisy
    # host.  Row content is unchanged (row i is always the same turn).
    n_parts = max(2, spark.sparkContext.defaultParallelism * 2)
    return (
        spark.range(0, n_turns, 1, n_parts)
        .select(
            F.concat(F.lit("C"), F.lpad((F.col("id") / turns_per_conv).cast("long").cast("string"), 8, "0")).alias("conv_id"),
            F.pmod(F.col("id"), F.lit(turns_per_conv)).cast("int").alias("turn_idx"),
            F.element_at(roles, (F.pmod(F.col("id"), F.lit(2)) + 1).cast("int")).alias("role"),
            text.alias("text"),
            F.lit("").alias("tool"),
            (F.lit(1767225600).cast("timestamp") + F.make_interval(secs=F.col("id").cast("double"))).alias("ts"),
        )
    )


def transcripts_from_documents(documents: DataFrame, turns_per_conv: int = 5, data_dir: str | None = None) -> DataFrame:
    """Deterministic transcripts derived from a ``documents`` table.

    Used by the driver-facing queries: the sandbox's synthetic
    ``documents.parquet`` provides scale-proportional row counts and a
    stable ``doc_id``; turn text is note template ``doc_id % 10`` so the
    pipeline's expected output is known per template (the DuckDB oracle
    reconstructs the same table in SQL).
    """
    templates = note_templates(data_dir)
    tarr = F.array(*[F.lit(t) for t in templates])
    roles = F.array(F.lit("user"), F.lit("assistant"))
    d = F.col("doc_id")
    return documents.select(
        F.concat(F.lit("C"), F.lpad((d / turns_per_conv).cast("long").cast("string"), 8, "0")).alias("conv_id"),
        F.pmod(d, F.lit(turns_per_conv)).cast("int").alias("turn_idx"),
        F.element_at(roles, (F.pmod(d, F.lit(2)) + 1).cast("int")).alias("role"),
        F.element_at(tarr, (F.pmod(d, F.lit(len(templates))) + 1).cast("int")).alias("text"),
        F.lit("").alias("tool"),
        (F.lit(1767225600).cast("timestamp") + F.make_interval(secs=d.cast("double"))).alias("ts"),
    )
