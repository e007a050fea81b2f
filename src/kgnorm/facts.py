"""Fact canonicalization: mentions + top candidates → deduplicated facts.

The reference builds one ClinicalFact per mention's top candidate and
merges duplicates on the 5-part key ``(patient_id, omop_concept_id,
assertion, temporality, experiencer)`` with noisy-OR confidence
``1 - (1-a)(1-b)`` (fact_builder.py:208-250, executed row-at-a-time in
fact_builder_db.py:56-204).

Spark-first: the per-row lookup/merge loop becomes ONE distributed
hash aggregation.  Noisy-OR over any number of evidences is
order-independent, so it is safe as a partial+final agg; we compute it in
log space::

    merged = 1 - exp(sum(log(1 - c)))

with ``1 - c`` floored at 1e-15 so a perfect-confidence evidence doesn't
send ``log`` to null (Spark's ``log`` returns null for non-positive
input, unlike CPython which the reference relies on).

The conversation (``conv_id``) plays the reference's ``patient_id`` role
(SURVEY §1.1: transcripts replace documents).

Attributes that the reference resolves by "first processed wins"
(concept_name, domain — insertion order in a mutable DB row) are made
deterministic here with ``min_by`` over the mention's position
``(turn_idx, start_offset, end_offset)``; triple parity is unaffected
because the dedup key doesn't include them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

FACT_KEY = ["conv_id", "omop_concept_id", "assertion", "temporality", "experiencer"]

# packed mention-position key multipliers — shared by the batch agg, the
# incremental merge, the streaming state kernel AND the SQL oracles
# (turn*1e8 + start*1e4 + end); offsets ≥ 10^4 bleed into the next
# field, a documented quirk every consumer reproduces identically
ORD_TURN = 100_000_000
ORD_START = 10_000


def ord_value(turn_idx: int, start_offset: int, end_offset: int) -> int:
    """Pure-Python twin of :func:`_ord_key` (streaming state kernel)."""
    return turn_idx * ORD_TURN + start_offset * ORD_START + end_offset


def _ord_key():
    """Numeric mention-position key for deterministic first-evidence-wins picks;
    fits in a bigint for any realistic turn/offset ranges."""
    return (
        F.col("turn_idx").cast("long") * F.lit(ORD_TURN)
        + F.col("start_offset").cast("long") * F.lit(ORD_START)
        + F.col("end_offset").cast("long")
    )


def mention_facts_input(mentions: DataFrame, top_candidates: DataFrame) -> DataFrame:
    """FactInput rows: each mention's top candidate (rank 1) plus the
    mention's context attributes.

    Mentions without any candidate are skipped (document_processing.py:249-251).
    The candidate rows already CARRY the mention attributes
    (kgnorm.link.ATTR_COLS), so this is a pure projection — no join back
    to the mention table (which at target scale is 10^12 × ~5 rows).
    ``mentions`` is accepted for interface compatibility and only used as
    a fallback when given candidates lack the attribute columns.
    """
    want = [
        "conv_id", "turn_idx", "start_offset", "end_offset",
        "omop_concept_id", "concept_name", "domain_id",
        "assertion", "temporality", "experiencer", "confidence",
    ]
    if set(want) <= set(top_candidates.columns):
        return top_candidates.select(*want)
    cand = top_candidates.select(
        "conv_id", "turn_idx", "start_offset", "end_offset",
        "omop_concept_id", "concept_name", "domain_id",
    )
    m = mentions.select(
        "conv_id", "turn_idx", "start_offset", "end_offset",
        "assertion", "temporality", "experiencer", "confidence",
    )
    return m.join(cand, ["conv_id", "turn_idx", "start_offset", "end_offset"])


def build_facts(fact_inputs: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Aggregate FactInput rows into canonical facts (noisy-OR merge).

    Shuffle plan: plain ``groupBy`` — Spark's partial (map-side)
    aggregation collapses each fact's evidences BEFORE the exchange.
    Because upstream extraction already co-partitions a conversation's
    mentions, the partial agg fully combines duplicates, so the exchange
    carries ~facts-many narrow rows instead of ~mentions-many wide ones.
    Measured at 12M turns / 60M mentions (local[32]): 30.2s for
    facts→triples vs 66.6s for the alternative single-exchange plan
    (explicit repartition(conv_id) whose hash(conv) partitioning lets the
    agg and the graph window reuse one exchange — fewer exchanges but
    2.2× more shuffled bytes).  ``num_partitions`` kept for API
    compatibility; unused.
    """
    return (
        fact_inputs
        .withColumn("_ord", _ord_key())
        .groupBy(*FACT_KEY)
        .agg(
            F.expr("min_by(concept_name, _ord)").alias("concept_name"),
            F.expr("min_by(domain_id, _ord)").alias("domain"),
            (1.0 - F.exp(F.sum(F.log(F.greatest(1.0 - F.col("confidence"), F.lit(1e-15)))))).alias("confidence"),
            F.count(F.lit(1)).alias("evidence_count"),
            F.min("turn_idx").alias("first_turn_idx"),
            F.expr("min_by(start_offset, _ord)").alias("first_start_offset"),
        )
        .select(
            "conv_id", "omop_concept_id", "concept_name", "domain",
            "assertion", "temporality", "experiencer", "confidence",
            "evidence_count", "first_turn_idx", "first_start_offset",
        )
    )


def _is_facts_shaped(df: DataFrame) -> bool:
    """True when df is a build_facts output (already aggregated) rather
    than raw FactInput rows."""
    return "evidence_count" in df.columns


def merge_facts(existing: DataFrame, new_inputs: DataFrame) -> DataFrame:
    """MERGE-shaped incremental noisy-OR re-aggregation — the batch
    upsert for stream-appended turns (kgnorm/streaming.py scopes the
    sink; this closes the append-only 10^12-turn loop).

    ``existing`` is a previously-built facts table (``build_facts``
    output); ``new_inputs`` are FactInput rows for NEWLY-ARRIVED turns
    only — or an ALREADY-AGGREGATED delta (build_facts output, detected
    by its evidence_count column) for callers that computed it anyway.  Noisy-OR is associative and commutative, so merging the
    stored fact with the delta's aggregate equals re-aggregating from
    scratch:  ``1 - (1-c_old)(1-c_delta)``, computed in log space like
    ``build_facts``.  Confidence can wobble in the last ulps (the stored
    ``confidence`` re-enters log space through ``1 - c``), which the
    universal 6-dp consumer rounding absorbs; every other column is
    exactly the full-rerun value.  Cross-side first-evidence comparison
    uses the batch agg's OWN packed ord key (turn·ORD_TURN +
    start·ORD_START) — the batch ``min_by`` additionally ranks
    end_offset, unknowable from the stored row; exact packed ties
    prefer the existing side (only cosmetic columns are affected; the
    dedup key never is).  NULL fact-key attributes merge like the batch
    groupBy (null-safe key equality), not like SQL join NULLs.

    Spark plan = the MERGE INTO pattern: aggregate the (small) delta,
    then ONE shuffle join on the fact key.  On Iceberg this maps 1:1 to
    ``MERGE INTO facts USING delta ON <FACT_KEY> WHEN MATCHED THEN
    UPDATE ... WHEN NOT MATCHED THEN INSERT``; for plain parquet use
    ``upsert_facts_parquet`` (partition-scoped rewrite).
    """
    delta = new_inputs if _is_facts_shaped(new_inputs) else build_facts(new_inputs)
    e, n = existing.alias("e"), delta.alias("n")
    # null-safe key equality: build_facts' groupBy treats NULL key
    # attributes as equal, so the merge join must too — a plain
    # on=FACT_KEY join would leave NULL-keyed facts unmatched and
    # duplicate them instead of merging
    cond = None
    for k in FACT_KEY:
        c = F.col(f"e.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = c if cond is None else cond & c
    joined = e.join(n, cond, "full")

    e_has = F.col("e.evidence_count").isNotNull()
    n_has = F.col("n.evidence_count").isNotNull()

    # side whose first evidence comes earliest in document order — the
    # SAME packed ord the batch agg minimizes (minus the unstored
    # end_offset term), so merge picks exactly like build_facts even
    # where the packed key's ≥10^4-offset quirk reorders spans
    def _side_ord(side: str):
        return (
            F.col(f"{side}.first_turn_idx").cast("long") * F.lit(ORD_TURN)
            + F.col(f"{side}.first_start_offset").cast("long") * F.lit(ORD_START)
        )

    e_first = e_has & (~n_has | (_side_ord("e") <= _side_ord("n")))

    def _first(col: str):
        return F.when(e_first, F.col(f"e.{col}")).otherwise(F.col(f"n.{col}"))

    def _log1m(side: str):
        return F.when(
            F.col(f"{side}.evidence_count").isNotNull(),
            F.log(F.greatest(1.0 - F.col(f"{side}.confidence"), F.lit(1e-15))),
        ).otherwise(F.lit(0.0))

    conf = (
        F.when(~n_has, F.col("e.confidence"))       # untouched fact: bit-identical
        .when(~e_has, F.col("n.confidence"))        # brand-new fact: bit-identical
        .otherwise(1.0 - F.exp(_log1m("e") + _log1m("n")))
    )
    return joined.select(
        *[F.coalesce(F.col(f"e.{k}"), F.col(f"n.{k}")).alias(k) for k in FACT_KEY],
        _first("concept_name").alias("concept_name"),
        _first("domain").alias("domain"),
        conf.alias("confidence"),
        (F.coalesce(F.col("e.evidence_count"), F.lit(0))
         + F.coalesce(F.col("n.evidence_count"), F.lit(0))).alias("evidence_count"),
        # least() skips nulls — min(turn) across whichever sides exist
        F.least(F.col("e.first_turn_idx"), F.col("n.first_turn_idx"))
        .alias("first_turn_idx"),
        _first("first_start_offset").alias("first_start_offset"),
    )


def bucket_col(n_buckets: int):
    """Stable conv_id bucketing for the parquet facts layout."""
    return F.pmod(F.hash("conv_id"), F.lit(n_buckets))


def upsert_facts_parquet(
    spark, facts_dir: str, new_inputs: DataFrame, n_buckets: int = 64
) -> None:
    """Parquet fallback for the Iceberg MERGE: the facts table lives
    partitioned by ``_bucket = pmod(hash(conv_id), n_buckets)``; an
    upsert re-aggregates ONLY the buckets containing delta conversations
    and rewrites just those directories via dynamic partition overwrite
    — at 10^9 facts an append touching 1% of conversations rewrites ~1%
    of the table, never the whole thing.

    First call (no table yet) writes all buckets.
    """
    import os

    delta = build_facts(new_inputs).withColumn("_bucket", bucket_col(n_buckets))
    # dynamic-overwrite commits don't write a root _SUCCESS marker —
    # table presence = any bucket partition directory
    table_exists = os.path.isdir(facts_dir) and any(
        e.startswith("_bucket=") for e in os.listdir(facts_dir))
    if table_exists:
        existing = spark.read.parquet(facts_dir)
        hot = delta.select("_bucket").distinct()
        touched = existing.join(F.broadcast(hot), "_bucket", "left_semi")
        # pass the ALREADY-AGGREGATED delta — merge_facts would otherwise
        # re-run build_facts(new_inputs) and its whole upstream lineage
        merged = merge_facts(
            touched.drop("_bucket"), delta.drop("_bucket")
        ).withColumn("_bucket", bucket_col(n_buckets))
        # the write dynamically overwrites the very partitions the plan
        # reads — materialize the merged hot buckets first to sever the
        # read-from/overwrite cycle (Iceberg's MERGE does this inside
        # its snapshot transaction; a production parquet variant could
        # instead stage to a sibling dir and swap, like
        # kgnorm.checkpoints.StageStore)
        merged = merged.localCheckpoint(eager=True)
    else:
        merged = delta
    with _partition_overwrite(spark, "dynamic"):
        merged.write.mode("overwrite").partitionBy("_bucket").parquet(facts_dir)


def _partition_overwrite(spark, mode: str):
    from kgnorm.session import conf_override

    return conf_override(spark, "spark.sql.sources.partitionOverwriteMode", mode)


def positive_facts(facts: DataFrame) -> DataFrame:
    """Positive-event projection: ABSENT facts filtered.

    The facts table itself always preserves negated findings
    (fact_builder.py:252-264 — the negation-preservation invariant);
    this projection is only for positive-event exports
    (specs/omop_export.md:48-58).
    """
    return facts.filter(F.col("assertion") != "absent")
