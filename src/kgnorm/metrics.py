"""Per-partition lineage/metrics rows and pipeline invariant checks.

The north rule requires the materialized graph to carry per-partition
lineage and metrics rows; the reference's analogue is its graph stats
and pipeline stage counters (graph_builder_db.py:284-332,
extraction_pipeline.py:737-758), which we re-express as small
aggregations that run as part of the job and land in a ``metrics``
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kgnorm import schemas


def stage_metrics(df: DataFrame, stage: str) -> DataFrame:
    """Per-partition row/conversation counts for a stage output.

    ``partition_id`` is the physical partition the row lived in when the
    stage materialized — the lineage hook for debugging skew and for
    verifying a resumed run covered every partition.
    """
    cols = df.columns
    conv = F.col("conv_id") if "conv_id" in cols else F.lit("")
    turn = F.col("turn_idx") if "turn_idx" in cols else F.lit(None).cast("int")
    return (
        df.select(
            F.spark_partition_id().alias("partition_id"),
            conv.alias("conv_id"),
            turn.alias("turn_idx"),
        )
        .groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.count_distinct("conv_id").alias("convs"),
            F.min("turn_idx").alias("min_turn_idx"),
            F.max("turn_idx").alias("max_turn_idx"),
        )
        .select(
            F.lit(stage).alias("stage"),
            "partition_id", "rows", "convs", "min_turn_idx", "max_turn_idx",
        )
    )


def domain_counts(facts: DataFrame) -> DataFrame:
    """Graph-stats analogue: fact counts per conversation and domain."""
    return facts.groupBy("conv_id", "domain").agg(F.count(F.lit(1)).alias("n_facts"))


def mention_span_check(transcripts: DataFrame, mentions: DataFrame) -> int:
    """Per-turn text-equality invariant (north rule).

    Every mention's ``[start_offset, end_offset)`` slice of the ORIGINAL
    turn text must equal its ``mention_text`` — proving the pipeline
    never mutated ``text`` and offsets stay valid under the stable
    ``(conv_id, turn_idx)`` ordering.  Returns the number of violations
    (0 == invariant holds).
    """
    joined = mentions.join(transcripts.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"])
    bad = joined.filter(
        F.expr("substring(text, start_offset + 1, end_offset - start_offset)") != F.col("mention_text")
    )
    return bad.count()


def turn_order_check(transcripts: DataFrame) -> int:
    """Stable turn ordering: (conv_id, turn_idx) must be unique. Returns dup count."""
    return (
        transcripts.groupBy("conv_id", "turn_idx")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
