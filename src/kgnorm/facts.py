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

def _ord_key():
    """Numeric mention-position key for deterministic first-evidence-wins picks;
    fits in a bigint for any realistic turn/offset ranges."""
    return (
        F.col("turn_idx").cast("long") * F.lit(100_000_000)
        + F.col("start_offset").cast("long") * F.lit(10_000)
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


def positive_facts(facts: DataFrame) -> DataFrame:
    """Positive-event projection: ABSENT facts filtered.

    The facts table itself always preserves negated findings
    (fact_builder.py:252-264 — the negation-preservation invariant);
    this projection is only for positive-event exports
    (specs/omop_export.md:48-58).
    """
    return facts.filter(F.col("assertion") != "absent")
