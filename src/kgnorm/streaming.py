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

from pyspark.broadcast import Broadcast
from pyspark.sql import DataFrame, SparkSession, functions as F

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
