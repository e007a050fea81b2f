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


def test_stateful_facts_converges_to_batch(spark, tmp_path):
    """applyInPandasWithState noisy-OR accumulator: for every fact key
    the LAST emission (max evidence_count) must equal the batch
    build_facts row over all streamed evidence (confidence at 6 dp)."""
    from kgnorm import facts as facts_mod

    in_dir = str(tmp_path / "fi")
    os.makedirs(in_dir)
    schema = (
        "conv_id string, turn_idx int, start_offset int, end_offset int,"
        " assertion string, temporality string, experiencer string,"
        " confidence double, omop_concept_id long, concept_name string,"
        " domain_id string"
    )
    rows = []
    for c in range(4):
        for t in range(6):
            rows.append((
                f"C{c}", t, (t * 3) % 20, (t * 3) % 20 + 4,
                "present" if (c + t) % 3 else "absent", "current", "patient",
                round(0.35 + 0.08 * ((c + t) % 6), 2),
                (c + t) % 3 + 1, f"Concept {(c + t) % 3 + 1}", "condition",
            ))
    all_inputs = spark.createDataFrame(rows, schema)
    # two files → two micro-batches with maxFilesPerTrigger=1, so most
    # fact keys accumulate evidence ACROSS batches
    all_inputs.filter(F.col("turn_idx") < 3).coalesce(1).write.mode("append").parquet(in_dir)
    all_inputs.filter(F.col("turn_idx") >= 3).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        streaming.stateful_facts(stream)
        .writeStream.format("memory").queryName("stateful_facts_t")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckf"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    emitted = spark.sql("select * from stateful_facts_t").collect()
    key = lambda r: (r.conv_id, r.omop_concept_id, r.assertion,
                     r.temporality, r.experiencer)
    last = {}
    for r in emitted:
        if key(r) not in last or r.evidence_count > last[key(r)].evidence_count:
            last[key(r)] = r
    expected = {key(r): r for r in facts_mod.build_facts(all_inputs).collect()}
    assert set(last) == set(expected)
    # keys split across micro-batches must show progressive emissions
    assert len(emitted) > len(expected)
    for k, r in last.items():
        e = expected[k]
        assert r.evidence_count == e.evidence_count, k
        assert round(r.confidence, 6) == round(e.confidence, 6), k
        assert r.concept_name == e.concept_name and r.domain == e.domain, k
        assert r.first_turn_idx == e.first_turn_idx, k
        assert r.first_start_offset == e.first_start_offset, k


def test_stateful_facts_state_survives_restart(spark, tmp_path):
    """Stop/restart with the same checkpoint: batch-2 emissions must
    fold into state RECOVERED from the state store (not recomputed), so
    keys touched in batch 2 reflect batch-1 evidence too."""
    from kgnorm import facts as facts_mod

    in_dir = str(tmp_path / "fi2")
    ck = str(tmp_path / "ckr")
    os.makedirs(in_dir)
    schema = (
        "conv_id string, turn_idx int, start_offset int, end_offset int,"
        " assertion string, temporality string, experiencer string,"
        " confidence double, omop_concept_id long, concept_name string,"
        " domain_id string"
    )
    b1 = [("C1", 0, 0, 4, "present", "current", "patient", 0.8, 1, "Cough", "condition"),
          ("C1", 1, 5, 9, "present", "current", "patient", 0.6, 1, "cough", "condition")]
    b2 = [("C1", 7, 2, 6, "present", "current", "patient", 0.5, 1, "COUGH", "condition")]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(in_dir)

    out_dir = str(tmp_path / "sfr_out")

    def run():
        # the production host: foreachBatch sink (memory sink can't
        # recover from a checkpoint)
        q = streaming.run_stateful_facts_to_dir(spark, in_dir, out_dir, ck)
        q.awaitTermination(120)

    run()
    n_first = spark.read.parquet(out_dir).count()
    assert n_first == 1  # batch 1 emitted the accumulated fact once
    # restart with one NEW file on the SAME checkpoint — only batch 2 emits
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(in_dir)
    run()

    all_rows = spark.read.parquet(out_dir).collect()
    out2 = [r for r in all_rows if r.evidence_count > 2]
    assert len(all_rows) == 2 and len(out2) == 1
    r = out2[0]
    # evidence_count 3 proves batch-1 state was recovered, not rebuilt
    assert r.evidence_count == 3
    expected = facts_mod.build_facts(
        spark.createDataFrame(b1 + b2, schema)).collect()[0]
    assert round(r.confidence, 6) == round(expected.confidence, 6)
    assert r.concept_name == expected.concept_name == "Cough"
    assert r.first_turn_idx == 0 and r.first_start_offset == 0

    # the continuously-current view picks the max-evidence emission and
    # equals the batch facts table over everything streamed
    view = streaming.latest_stateful_facts(spark, out_dir).collect()
    assert len(view) == 1
    v = view[0]
    assert v.evidence_count == 3
    assert round(v.confidence, 6) == round(expected.confidence, 6)

    # at-least-once sink: a crash-replayed micro-batch re-appends the
    # SAME rows — the view must absorb the duplicate
    dup = spark.read.parquet(out_dir).filter(F.col("evidence_count") == 3)
    dup.write.mode("append").parquet(out_dir)
    view2 = streaming.latest_stateful_facts(spark, out_dir).collect()
    assert len(view2) == 1 and view2[0].evidence_count == 3
