"""Structured Streaming variant of the extraction pipeline.

The reference is purely batch (SURVEY §2.12: Redis/RQ job queue, no
watermarks or stateful operators), so batch is this engine's parity
path.  This module exists because a transcripts table at 10^12-turn
scale is APPEND-ONLY in practice: new conversation turns arrive
continuously, and re-running the batch job over the full table is
wasteful.  The same extraction/linking logic runs incrementally here:

    readStream (parquet/Iceberg dir) → extract UDF → link → append sink

Facts/graph stay batch jobs over the streamed mention/candidate tables
(noisy-OR re-aggregation needs full groups; running it incrementally
would require update-mode sinks, which Iceberg handles with MERGE — out
of scope for the sandbox).  A 10-minute watermark on ``ts`` bounds state
for the per-window mention-rate metric, the only stateful operator.
"""

from __future__ import annotations

import json
import math
from typing import Iterator

import pandas as pd

from pyspark.broadcast import Broadcast
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kgnorm import schemas
from kgnorm.extract import extract_mentions_df


def stream_transcripts(spark: SparkSession, input_dir: str) -> DataFrame:
    """Streaming scan of a transcripts directory (one file per micro-batch batch)."""
    return (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def stream_mentions(transcripts: DataFrame, dictionary: Broadcast) -> DataFrame:
    """The SAME extraction stage as batch — mapInPandas is streaming-safe
    (stateless per batch), so the plan is reused verbatim."""
    return extract_mentions_df(transcripts, dictionary, num_partitions=None)


def turn_rate(transcripts: DataFrame) -> DataFrame:
    """Windowed turn counts with late-data handling (10-min watermark) —
    the pipeline's only stateful streaming operator."""
    return (
        transcripts.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute"))
        .agg(F.count(F.lit(1)).alias("turns"))
        .select(F.col("window.start").alias("window_start"), "turns")
    )


STATEFUL_FACTS_SCHEMA = (
    "conv_id string, omop_concept_id long, assertion string, temporality string,"
    " experiencer string, concept_name string, domain string, confidence double,"
    " evidence_count long, first_turn_idx int, first_start_offset int"
)
_FACT_STATE_SCHEMA = "state_json string"


def _stateful_facts_fn(key, pdfs: Iterator[pd.DataFrame], state):
    """Per-conversation fact accumulator (see :func:`stateful_facts`).

    State = JSON dict fact_key -> [log1m_sum, evidence_count, min_ord
    (facts.ord_value's PACKED key — the same quirky turn·1e8+start·1e4
    +end the batch agg and the SQL oracles minimize), start@min_ord,
    name@min_ord, domain@min_ord, min_turn] — exactly the information
    the batch ``build_facts`` aggregation carries per group
    (first_turn_idx is an independent min there, not derived from the
    ord), so every emission equals what a batch rerun over the
    evidence-so-far would produce (confidence up to summation order,
    absorbed by the 6-dp consumer rounding).
    """
    from kgnorm.facts import ord_value

    conv_id = key[0]
    st = json.loads(state.get[0]) if state.exists else {}
    touched = set()
    for pdf in pdfs:
        for r in pdf.itertuples(index=False):
            k = json.dumps([int(r.omop_concept_id), r.assertion,
                            r.temporality, r.experiencer])
            ordv = ord_value(int(r.turn_idx), int(r.start_offset),
                             int(r.end_offset))
            log1m = math.log(max(1.0 - float(r.confidence), 1e-15))
            if k in st:
                s = st[k]
                s[0] += log1m
                s[1] += 1
                if ordv < s[2]:
                    s[2], s[3], s[4], s[5] = \
                        ordv, int(r.start_offset), r.concept_name, r.domain_id
                s[6] = min(s[6], int(r.turn_idx))
            else:
                st[k] = [log1m, 1, ordv, int(r.start_offset),
                         r.concept_name, r.domain_id, int(r.turn_idx)]
            touched.add(k)
    state.update((json.dumps(st),))
    cols = [c.strip().split(" ")[0] for c in STATEFUL_FACTS_SCHEMA.split(",")]
    out: dict = {c: [] for c in cols}
    for k in sorted(touched):
        cid, assertion, temporality, experiencer = json.loads(k)
        s = st[k]
        out["conv_id"].append(conv_id)
        out["omop_concept_id"].append(cid)
        out["assertion"].append(assertion)
        out["temporality"].append(temporality)
        out["experiencer"].append(experiencer)
        out["concept_name"].append(s[4])
        out["domain"].append(s[5])
        out["confidence"].append(1.0 - math.exp(s[0]))
        out["evidence_count"].append(s[1])
        out["first_turn_idx"].append(s[6])
        out["first_start_offset"].append(s[3])
    yield pd.DataFrame(out, columns=cols)


def stateful_facts(fact_inputs: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: incremental noisy-OR fact
    canonicalization via ``applyInPandasWithState``.

    The batch path re-aggregates with ``facts.build_facts`` /
    ``facts.merge_facts``; this operator instead keeps the per-fact
    noisy-OR accumulator AS STREAMING STATE keyed by conv_id, folds
    each micro-batch's FactInput rows in, and emits the UPDATED
    canonical fact rows (update output mode) — a continuously-current
    facts view with per-batch latency, no full-table rescan.  State per
    conversation is bounded by its distinct fact keys (ontology-bounded
    x ~45 context combos), so a 10^12-turn stream holds state
    proportional to distinct (conv, concept) pairs only.

    For each fact key the LAST emission (max evidence_count) equals the
    batch ``build_facts`` row over all evidence seen, confidence up to
    float summation order (6-dp rounding absorbs it).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return fact_inputs.groupBy("conv_id").applyInPandasWithState(
        _stateful_facts_fn,
        outputStructType=STATEFUL_FACTS_SCHEMA,
        stateStructType=_FACT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FACT_INPUT_SCHEMA = (
    "conv_id string, turn_idx int, start_offset int, end_offset int,"
    " omop_concept_id long, concept_name string, domain_id string,"
    " assertion string, temporality string, experiencer string,"
    " confidence double"
)


def run_stateful_facts_to_dir(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
):
    """Production host for :func:`stateful_facts`: FactInput parquet
    stream → stateful noisy-OR accumulator → ``foreachBatch`` append
    sink writing each micro-batch's UPDATED fact rows (tagged with the
    epoch id) to ``output_dir``.

    ``foreachBatch``, not the memory sink: the memory sink collects to
    the driver and cannot recover from a checkpoint, so a restarted
    query would silently restart state from scratch.  With this host a
    stop/kill + restart on the same ``checkpoint_dir`` resumes the
    accumulator mid-stream (tests/test_streaming.py pins it, and the
    driver harness runs the same path).  The file sink is at-least-once
    across crash replays; :func:`latest_stateful_facts` makes the
    readback idempotent.
    """
    stream = (
        spark.readStream.schema(FACT_INPUT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("_epoch", F.lit(batch_id)) \
            .write.mode("append").parquet(output_dir)

    writer = (
        stateful_facts(stream)
        .writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def latest_stateful_facts(spark: SparkSession, output_dir: str) -> DataFrame:
    """Continuously-current facts view over the update-mode emission
    log: per fact key, the emission with the highest evidence_count
    (ties → latest epoch).  A crash-replayed micro-batch re-appends
    byte-identical rows (the accumulator state is deterministic), so the
    argmax also dedups the at-least-once sink — the view equals the
    batch ``facts.build_facts`` over all evidence streamed so far."""
    from kgnorm.facts import FACT_KEY

    emitted = spark.read.parquet(output_dir)
    w = Window.partitionBy(*FACT_KEY).orderBy(
        F.desc("evidence_count"), F.desc("_epoch"))
    return (
        emitted.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_epoch")
    )


def run_stream_to_dir(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    dictionary: Broadcast,
    available_now: bool = True,
):
    """Incremental extraction job: new transcript files → mention parquet.

    ``available_now=True`` drains everything currently present and stops
    (the testable mode); in production the trigger would be continuous
    micro-batches with the same checkpoint dir providing exactly-once
    file-sink semantics.
    """
    transcripts = stream_transcripts(spark, input_dir)
    mentions = stream_mentions(transcripts, dictionary)
    writer = (
        mentions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
