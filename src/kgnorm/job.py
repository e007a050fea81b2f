"""End-to-end pipeline orchestration (the spark-submit entry point).

One Spark job replaces the reference's API→Redis→RQ-worker→Postgres
round-trip loop (jobs/document_processing.py:92-310, SURVEY §3.1)::

    read transcripts
      → extract   (shuffle-free partition cap + broadcast-AC Arrow UDF)
      → link      (broadcast dictionary direct path + tiered cascade)
      → facts     (5-part-key noisy-OR hash agg)
      → canon     (optional: Maps-to closure via hash-min CC)
      → graph     (nodes/edges/triples, deterministic ids)
      → metrics   (per-partition lineage rows)

Each stage checkpoints through a StageStore; ``--resume`` skips stages
whose outputs already exist.  Run it on a cluster as::

    spark-submit --py-files kgnorm.zip -m kgnorm.job \
        --input <transcripts path/table> --output <warehouse dir> [--resume]
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from kgnorm import canon, extract, facts as facts_mod, graph, link, metrics, ontology, synth
from kgnorm.checkpoints import StageStore


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    store: StageStore | None = None,
    resume: bool = False,
    canonicalize: bool = False,
    num_partitions: int | None = None,
    data_dir: str | None = None,
) -> dict[str, DataFrame]:
    """Run extract→link→facts→graph; returns every stage DataFrame.

    With a ``store``, stages checkpoint and (with ``resume=True``) skip
    recomputation.  ``canonicalize`` adds the CC-based alias-merged fact
    and triple outputs alongside the parity (reference-faithful) ones.
    """
    ont = ontology.load_fixture_ontology(data_dir)
    dictionary = ontology.broadcast_dictionary(spark, ont)
    concepts = ontology.concepts_df(spark, ont)
    synonyms = ontology.synonyms_df(spark, ont)

    def checkpointed(name: str, compute, partition_by=None) -> DataFrame:
        if store is None:
            # no checkpoint table → persist: each stage is referenced by
            # several downstream branches, and without materialization the
            # whole extraction subtree would re-execute once per branch
            return compute().persist()
        return store.get_or_compute(spark, name, compute, resume=resume, partition_by=partition_by)

    mentions = checkpointed(
        "mentions", lambda: extract.extract_mentions_df(transcripts, dictionary, num_partitions)
    )
    all_direct = ontology.all_entries_linked(ont)
    candidates = checkpointed(
        "candidates",
        lambda: link.link_mentions(mentions, concepts, synonyms, assume_all_direct=all_direct),
    )
    top = link.top_candidates(candidates)
    facts = checkpointed(
        "facts", lambda: facts_mod.build_facts(facts_mod.mention_facts_input(mentions, top))
    )
    # one shared window for nodes/edges/triples (see graph.first_facts)
    graph_base = checkpointed("graph_base", lambda: graph.first_facts(facts))
    nodes = checkpointed("nodes", lambda: graph.build_nodes(graph_base, prepared=True))
    edges = checkpointed("edges", lambda: graph.build_edges(graph_base, prepared=True))
    triples = checkpointed("triples", lambda: graph.build_triples(graph_base, prepared=True))

    out = {
        "mentions": mentions,
        "candidates": candidates,
        "facts": facts,
        "nodes": nodes,
        "edges": edges,
        "triples": triples,
    }

    if canonicalize:
        relationships = ontology.relationships_df(spark, ont)
        canonical_facts = checkpointed(
            "canonical_facts", lambda: canon.canonicalize_facts(facts, relationships)
        )
        out["canonical_facts"] = canonical_facts
        out["canonical_triples"] = checkpointed(
            "canonical_triples", lambda: graph.build_triples(canonical_facts)
        )

    if store is not None:
        all_metrics = (
            metrics.stage_metrics(mentions, "mentions")
            .unionByName(metrics.stage_metrics(facts, "facts"))
            .unionByName(metrics.stage_metrics(triples, "triples"))
        )
        store.write(all_metrics, "metrics")
        out["metrics"] = store.read(spark, "metrics")

    return out


def run_append(
    spark: SparkSession,
    new_transcripts: DataFrame,
    output: str,
    num_partitions: int | None = None,
    data_dir: str | None = None,
    n_buckets: int = 64,
) -> dict[str, DataFrame]:
    """Incremental append (the 10^12-turn operating mode): extract+link
    ONLY the newly-arrived turns, then MERGE their facts into the
    bucketed facts table at ``<output>/facts_bucketed`` — created on
    the first call, partition-scoped rewrites after
    (facts.upsert_facts_parquet) — and re-project the triples for the
    touched buckets only into ``<output>/triples_bucketed``.  Cost is
    proportional to the delta, never the stored table; both merged
    tables equal a full batch rerun over all turns ever appended
    (tests/test_job_append.py pins it).

    ``out["mentions"]`` is returned PERSISTED (it fed both the facts
    upsert and the triples projection); callers must ``unpersist()`` it
    when done — a long-lived session issuing sequential appends would
    otherwise accumulate cached mention partitions (the CLI does this
    after its span check).
    """
    import os

    ont = ontology.load_fixture_ontology(data_dir)
    dictionary = ontology.broadcast_dictionary(spark, ont)
    concepts = ontology.concepts_df(spark, ont)
    synonyms = ontology.synonyms_df(spark, ont)

    mentions = extract.extract_mentions_df(
        new_transcripts, dictionary, num_partitions).persist()
    candidates = link.link_mentions(
        mentions, concepts, synonyms,
        assume_all_direct=ontology.all_entries_linked(ont))
    fi = facts_mod.mention_facts_input(mentions, link.top_candidates(candidates))

    facts_dir = os.path.join(output, "facts_bucketed")
    facts_mod.upsert_facts_parquet(spark, facts_dir, fi, n_buckets=n_buckets)
    bucketed = spark.read.parquet(facts_dir)

    # triples projection maintained incrementally too: rebuild ONLY the
    # buckets the delta touched (bucket = f(conv_id) and the graph
    # window is conv-scoped, so per-bucket projection is exact) and
    # dynamically overwrite those partitions
    hot = (
        fi.select(facts_mod.bucket_col(n_buckets).alias("_bucket")).distinct()
    )
    touched = bucketed.join(F.broadcast(hot), "_bucket", "left_semi")
    # no read/overwrite cycle here: the plan reads facts_bucketed and
    # writes triples_bucketed
    triples = (
        graph.build_triples(touched.drop("_bucket"))
        .withColumn("_bucket", facts_mod.bucket_col(n_buckets))
    )
    triples_dir = os.path.join(output, "triples_bucketed")
    with facts_mod._partition_overwrite(spark, "dynamic"):
        triples.write.mode("overwrite").partitionBy("_bucket").parquet(triples_dir)

    return {
        "mentions": mentions,
        "facts": bucketed.drop("_bucket"),
        "triples": spark.read.parquet(triples_dir).drop("_bucket"),
    }


def main() -> None:
    from kgnorm.session import get_spark

    p = argparse.ArgumentParser(description="kgnorm KG-construction pipeline")
    p.add_argument("--input", help="transcripts parquet path (default: synthesize)")
    p.add_argument("--synth-turns", type=int, default=10_000, help="rows to synthesize when no --input")
    p.add_argument("--output", required=True, help="warehouse directory for stage tables")
    p.add_argument("--resume", action="store_true", help="skip stages whose outputs exist")
    p.add_argument("--canonicalize", action="store_true", help="also emit alias-merged outputs")
    p.add_argument("--append", action="store_true",
                   help="treat the input as NEWLY-ARRIVED turns and MERGE their "
                        "facts into <output>/facts_bucketed instead of rebuilding")
    p.add_argument("--partitions", type=int, default=None)
    args = p.parse_args()

    spark = get_spark("kgnorm-job")
    t0 = time.time()
    if args.input:
        transcripts = spark.read.parquet(args.input)
    else:
        transcripts = synth.synth_transcripts(spark, args.synth_turns)

    assert metrics.turn_order_check(transcripts) == 0, "duplicate (conv_id, turn_idx) keys"

    if args.append:
        out = run_append(spark, transcripts, args.output,
                         num_partitions=args.partitions)
        violations = metrics.mention_span_check(transcripts, out["mentions"])
        out["mentions"].unpersist()   # last consumer of the cached delta
        n_turns = transcripts.count()
        elapsed = time.time() - t0
        print(json.dumps({
            "turns_appended": n_turns,
            "facts_total": out["facts"].count(),
            "triples_total": out["triples"].count(),
            "span_violations": violations,
            "sec": round(elapsed, 2),
            "turns_per_sec": round(n_turns / elapsed, 1),
        }))
        spark.stop()
        return

    store = StageStore(args.output)
    out = run_pipeline(
        spark, transcripts, store=store, resume=args.resume,
        canonicalize=args.canonicalize, num_partitions=args.partitions,
    )

    violations = metrics.mention_span_check(transcripts, out["mentions"])
    n_turns = transcripts.count()
    n_triples = out["triples"].count()
    elapsed = time.time() - t0
    print(json.dumps({
        "turns": n_turns,
        "triples": n_triples,
        "span_violations": violations,
        "sec": round(elapsed, 2),
        "turns_per_sec": round(n_turns / elapsed, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
