"""Structured Streaming incremental extraction tests."""

import os

import pytest
from pyspark.sql import functions as F

from kgnorm import ontology, streaming, synth


def test_incremental_extraction_matches_batch(spark, tmp_path, ontology_bundle):
    from kgnorm.extract import extract_mentions_df

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)

    batch = synth.golden_transcripts(spark)
    batch.coalesce(1).write.mode("append").parquet(in_dir)

    dictionary = ontology.broadcast_dictionary(spark, ontology_bundle)
    q = streaming.run_stream_to_dir(spark, in_dir, out_dir, ck_dir, dictionary)
    q.awaitTermination(120)

    streamed = spark.read.parquet(out_dir)
    expected = extract_mentions_df(spark.read.parquet(in_dir), dictionary)
    key = ["conv_id", "turn_idx", "start_offset", "end_offset", "assertion"]
    assert sorted(map(tuple, streamed.select(*key).collect())) == \
        sorted(map(tuple, expected.select(*key).collect()))

    # second batch of files → only new rows appended (exactly-once resume)
    synth.golden_transcripts(spark).withColumn(
        "conv_id", F.concat(F.lit("X"), F.col("conv_id"))
    ).coalesce(1).write.mode("append").parquet(in_dir)
    q2 = streaming.run_stream_to_dir(spark, in_dir, out_dir, ck_dir, dictionary)
    q2.awaitTermination(120)
    streamed2 = spark.read.parquet(out_dir)
    assert streamed2.count() == 2 * expected.count()
    assert streamed2.filter(F.col("conv_id").startswith("X")).count() == expected.count()


def test_turn_rate_windowing(spark, tmp_path):
    in_dir = str(tmp_path / "in2")
    synth.golden_transcripts(spark).coalesce(1).write.parquet(in_dir)
    stream = streaming.stream_transcripts(spark, in_dir)
    rate = streaming.turn_rate(stream)
    # complete mode: with availableNow + a single batch, append mode would
    # wait for the watermark to close windows and emit nothing
    q = (
        rate.writeStream.format("memory").queryName("turn_rate_t")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from turn_rate_t").collect()
    # golden fixture: 10 turns one minute apart → one row per 1-min window
    assert sum(r.turns for r in rows) == 10
    assert all(r.turns == 1 for r in rows)
