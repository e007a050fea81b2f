"""Knowledge-graph materialization: facts → nodes, edges, triples.

Reproduces the reference's projection (graph_builder_db.py:170-216, type
maps graph_builder.py:209-245, spec specs/knowledge_graph.md:75-107):

* one hub node per conversation (the reference's patient node,
  graph_builder_db.py:44-97) — idempotent;
* one concept node per fact, deduplicated on
  ``(conv_id, node_type, omop_concept_id)`` with properties
  ``{assertion, temporality, experiencer, is_negated, is_uncertain}``;
* one edge hub →``has_<domain>``→ concept node, deduplicated on
  ``(source, target, edge_type)`` with property ``{assertion}``;
* the edge rows ARE the emitted (subj, pred, obj) triples.

Where the reference resolves collisions by processing order (first fact
creates the node; later facts with the same dedup key reuse it), we pick
the fact with the smallest ``(first_turn_idx, first_start_offset)`` —
deterministic, resume-safe.

IDs are deterministic ``sha2`` hashes of the natural keys instead of the
reference's random UUIDs (omop_exporter_db.py:33-77 already hashes for
export ids) so that re-running or resuming a stage yields byte-identical
rows — required for checkpoint resumability.

Negated facts are never dropped: they appear as triples with
``assertion = 'absent'`` (specs/knowledge_graph.md:155).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# domain → node_type (graph_builder.py:209-226)
_NODE_TYPE = (
    "CASE domain WHEN 'condition' THEN 'condition' WHEN 'drug' THEN 'drug' "
    "WHEN 'measurement' THEN 'measurement' WHEN 'procedure' THEN 'procedure' "
    "WHEN 'observation' THEN 'observation' WHEN 'device' THEN 'observation' "
    "ELSE 'observation' END"
)

# domain → edge_type (graph_builder.py:228-245)
_EDGE_TYPE = (
    "CASE domain WHEN 'condition' THEN 'has_condition' WHEN 'drug' THEN 'takes_drug' "
    "WHEN 'measurement' THEN 'has_measurement' WHEN 'procedure' THEN 'has_procedure' "
    "WHEN 'observation' THEN 'has_observation' WHEN 'device' THEN 'has_observation' "
    "ELSE 'has_observation' END"
)


def _node_id(*cols):
    return F.sha2(F.concat_ws("|", *cols), 256)


def hub_nodes(facts: DataFrame) -> DataFrame:
    """One patient/conversation hub node per conv_id (graph_builder_db.py:44-97)."""
    return (
        facts.select("conv_id").distinct()
        .select(
            _node_id(F.lit("patient"), F.col("conv_id")).alias("node_id"),
            "conv_id",
            F.lit("patient").alias("node_type"),
            F.lit(None).cast("long").alias("omop_concept_id"),
            F.col("conv_id").alias("label"),
            F.create_map(F.lit("patient_id"), F.col("conv_id")).alias("properties"),
        )
    )


def _facts_typed(facts: DataFrame) -> DataFrame:
    return facts.withColumn("node_type", F.expr(_NODE_TYPE)).withColumn("edge_type", F.expr(_EDGE_TYPE))


def first_facts(facts: DataFrame) -> DataFrame:
    """First-evidence fact per (conv_id, node_type, omop_concept_id).

    ONE aggregation serves nodes, edges, AND triples: ``edge_type`` is a
    bijection of ``node_type`` (both collapse only device→observation),
    so the three dedup groupings are identical partitions.  Checkpoint or
    persist this once and derive all graph outputs as projections.

    r6 note (measured, kept): a ``min_by``-per-column hash-aggregation
    formulation was benchmarked as the window's replacement and LOST
    3x (24.6 s vs 8.0 s at 41M facts, local[32]) — string-valued
    ``min_by`` buffers are not hash-aggregable, so the "hash" plan is a
    SortAggregate that sorts twice (map + reduce) and evaluates seven
    aggregate functions per row, vs the window's single sort and one
    ``row_number``.  The window formulation is the right one here.
    """
    typed = _facts_typed(facts)
    w = Window.partitionBy("conv_id", "node_type", "omop_concept_id").orderBy(
        "first_turn_idx", "first_start_offset", "assertion"
    )
    return typed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def concept_nodes(facts: DataFrame, prepared: bool = False) -> DataFrame:
    """Concept nodes deduplicated on (conv_id, node_type, concept_id)."""
    first = facts if prepared else first_facts(facts)
    return first.select(
        _node_id(F.lit("concept"), F.col("conv_id"), F.col("node_type"),
                 F.col("omop_concept_id").cast("string")).alias("node_id"),
        "conv_id",
        "node_type",
        "omop_concept_id",
        F.col("concept_name").alias("label"),
        F.create_map(
            F.lit("assertion"), F.col("assertion"),
            F.lit("temporality"), F.col("temporality"),
            F.lit("experiencer"), F.col("experiencer"),
            F.lit("is_negated"), (F.col("assertion") == "absent").cast("string"),
            F.lit("is_uncertain"), (F.col("assertion") == "possible").cast("string"),
        ).alias("properties"),
    )


def build_edges(facts: DataFrame, prepared: bool = False) -> DataFrame:
    """Hub→concept edges deduplicated on (source, target, edge_type)."""
    first = facts if prepared else first_facts(facts)
    src = _node_id(F.lit("patient"), F.col("conv_id"))
    dst = _node_id(F.lit("concept"), F.col("conv_id"), F.col("node_type"),
                   F.col("omop_concept_id").cast("string"))
    return first.select(
        _node_id(F.lit("edge"), F.col("conv_id"), F.col("edge_type"), F.col("node_type"),
                 F.col("omop_concept_id").cast("string")).alias("edge_id"),
        "conv_id",
        src.alias("source_node_id"),
        dst.alias("target_node_id"),
        "edge_type",
        F.create_map(F.lit("assertion"), F.col("assertion")).alias("properties"),
    )


def build_nodes(facts: DataFrame, prepared: bool = False) -> DataFrame:
    """All graph nodes: hub + concept nodes."""
    return hub_nodes(facts).unionByName(concept_nodes(facts, prepared))


def build_triples(facts: DataFrame, prepared: bool = False) -> DataFrame:
    """Emitted (subj, pred, obj) triples — the parity artifact.

    subj = the conversation hub (conv_id), pred = has_<domain> edge type,
    obj = ``concept:<omop_concept_id>``.  One row per distinct
    (subj, pred, obj); ``assertion`` is the first-evidence fact's value
    (the reference keeps the first-processed fact's edge property).
    """
    first = facts if prepared else first_facts(facts)
    return first.select(
        "conv_id",
        F.col("conv_id").alias("subj"),
        F.col("edge_type").alias("pred"),
        F.concat(F.lit("concept:"), F.col("omop_concept_id").cast("string")).alias("obj"),
        "omop_concept_id",
        "assertion",
    )
