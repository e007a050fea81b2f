"""Cross-vocabulary canonicalization via connected components.

The reference maps a source concept to its standard concept through a
single hop of ``concept_relationship.relationship_id = 'Maps to'``
(vocabulary_mapping.py:75-84, 302-352).  At 10^12-turn scale alias chains
can be multi-hop, so the north rule requires **iterative hash-min label
propagation (connected components) over a salted alias edge DataFrame**;
on reference-shaped (single-hop) data it converges in one iteration to
the same answer, which keeps it parity-safe.

Algorithm (driver-side loop over DataFrames):

1. undirected alias edges from {'Maps to', 'Mapped from'} rows;
2. labels(v) = v initially; each round every vertex takes
   ``min(label(v), min over neighbors of label(n))`` — two shuffles per
   round (large-to-small then small-to-large), with AQE handling skew;
   a hot concept with many aliases concentrates on one key, so the
   neighbor-min aggregation is pre-salted: a first partial ``groupBy``
   on ``(dst, salt)`` then a final ``groupBy(dst)`` (SURVEY §4);
3. stop when no label changed (count of changed rows == 0);
4. canonical representative per component = the component's preferred
   member: a 'Maps to' **target** that is never itself a 'Maps to'
   source (i.e. a chain terminal), tie-broken by min concept_id;
   components without such a terminal use the min concept_id.

``localCheckpoint`` truncates the iterative lineage each round so plans
don't grow exponentially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_SALT = 16


def alias_edges(relationships: DataFrame) -> DataFrame:
    """Undirected alias edge list from relationship rows."""
    maps = relationships.filter(F.col("relationship_id").isin("Maps to", "Mapped from"))
    fwd = maps.select(F.col("concept_id_1").alias("src"), F.col("concept_id_2").alias("dst"))
    rev = maps.select(F.col("concept_id_2").alias("src"), F.col("concept_id_1").alias("dst"))
    return fwd.unionByName(rev).filter(F.col("src") != F.col("dst")).distinct()


def connected_components(
    edges: DataFrame,
    max_iter: int = 25,
    salt: int = DEFAULT_SALT,
    loop_partitions: int | None = None,
) -> DataFrame:
    """Hash-min label propagation. Returns (concept_id, component_id).

    ``edges`` must be the symmetric (undirected) edge list with columns
    ``src, dst``.  Isolated vertices are absent (their component is
    themselves, callers coalesce).

    ``loop_partitions`` temporarily overrides
    ``spark.sql.shuffle.partitions`` for the iterative loop (restored
    after): each iteration runs 2 joins + 2 aggregations + an eager
    checkpoint + a convergence count, so with a KNOWN-small edge list
    (the ontology alias graph) session-default partition counts make
    fixed per-task scheduling dominate the loop.  Leave None for
    unknown-size inputs (document near-dup clustering), where AQE
    handles sizing.
    """
    if not loop_partitions:
        return _cc_loop(edges, max_iter, salt)
    from kgnorm.session import conf_override

    with conf_override(edges.sparkSession, "spark.sql.shuffle.partitions",
                       loop_partitions):
        return _cc_loop(edges, max_iter, salt)


def _cc_loop(edges: DataFrame, max_iter: int, salt: int) -> DataFrame:
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("concept_id"))
        .union(edges.select("dst"))
        .distinct()
        .withColumn("label", F.col("concept_id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # propagate each vertex's label to its neighbors, take the min.
        # two-level aggregation: partial min on (dst, salt) absorbs hot
        # vertices before the final per-dst min.
        prop = (
            edges.join(labels.withColumnRenamed("concept_id", "src"), "src")
            .select(F.col("dst").alias("concept_id"), "label")
            .withColumn("_salt", F.pmod(F.hash("label"), F.lit(salt)))
            .groupBy("concept_id", "_salt").agg(F.min("label").alias("label"))
            .groupBy("concept_id").agg(F.min("label").alias("nbr_label"))
        )
        new_full = (
            labels.join(prop, "concept_id", "left")
            .select(
                "concept_id",
                F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias("label"),
                # convergence flag carried through the checkpoint so the
                # changed-check reads materialized rows instead of
                # re-joining old vs new labels (one fewer shuffle/iter)
                (F.coalesce(F.col("nbr_label"), F.col("label")) < F.col("label")).alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_full.filter(F.col("_chg")).limit(1).count()
        labels = new_full.select("concept_id", "label")
        if changed == 0:
            break

    return labels.select("concept_id", F.col("label").alias("component_id"))


def canonical_mapping(relationships: DataFrame,
                      loop_partitions: int | None = None) -> DataFrame:
    """(concept_id → canonical_concept_id) for every aliased concept.

    Canonical = per component, the chain-terminal 'Maps to' target
    (appears as concept_id_2 of a 'Maps to' row and never as
    concept_id_1), min id on ties; else the component min id.

    The whole build runs at ``loop_partitions`` shuffle partitions and
    materializes eagerly: the alias graph is ontology-bounded (≤
    vocabulary size, nothing to do with turn count), so at
    session-default partition counts fixed per-task scheduling across
    the CC loop's ~2 iterations dominated the canon stage (measured
    4.9 s of the bench's 7.4 s canon time at 1M turns).  Default
    ``None`` sizes from the actual edge count (one cheap count job):
    ~100k edges per partition, floor 8, capped at the session default —
    so a full-OMOP alias graph (~10M rows) still gets wide shuffles
    while the fixture-sized graph stops paying 64-task fixed costs.
    The returned mapping is checkpointed — downstream broadcasts read
    materialized rows, not a replan at restored session partitioning.
    """
    from kgnorm.session import conf_override

    spark = relationships.sparkSession
    edges = alias_edges(relationships)
    if loop_partitions is None:
        sess = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        loop_partitions = max(8, min(sess, edges.count() // 100_000 + 1))
    with conf_override(spark, "spark.sql.shuffle.partitions", loop_partitions):
        comps = _cc_loop(edges, 25, DEFAULT_SALT)

        maps_to = relationships.filter(F.col("relationship_id") == "Maps to")
        sources = maps_to.select(F.col("concept_id_1").alias("concept_id")).distinct()
        targets = maps_to.select(F.col("concept_id_2").alias("concept_id")).distinct()
        terminals = targets.join(sources, "concept_id", "left_anti")

        comp_terminal = (
            comps.join(terminals, "concept_id", "left_semi")
            .groupBy("component_id")
            .agg(F.min("concept_id").alias("terminal_id"))
        )
        comp_min = comps.groupBy("component_id").agg(F.min("concept_id").alias("min_id"))
        canon = (
            comps.join(comp_min, "component_id")
            .join(comp_terminal, "component_id", "left")
            .select(
                "concept_id",
                F.coalesce(F.col("terminal_id"), F.col("min_id")).alias("canonical_concept_id"),
            )
        )
        return canon.filter(
            F.col("concept_id") != F.col("canonical_concept_id")
        ).localCheckpoint(eager=True)


def canonicalize_facts(facts: DataFrame, relationships: DataFrame) -> DataFrame:
    """Rewrite fact concept ids onto canonical concepts and re-merge.

    A broadcast join (the alias mapping is ontology-sized, i.e. tiny
    relative to facts), then the same 5-part-key noisy-OR re-aggregation
    as the base fact build, because two facts can collapse onto one
    canonical concept.

    r6 (guide §2.3 "shuffle fewer bytes"): only facts whose concept id
    PARTICIPATES in the alias mapping — as a rewritten source or as a
    rewrite target another fact can land on — can ever share a post-
    rewrite fact key.  ``facts`` is unique on the 5-part fact key (it is
    a ``build_facts``/``merge_facts`` output — the documented
    precondition), so every other fact is a singleton group whose
    aggregate is computable scalar-wise with the arithmetically
    IDENTICAL expressions (``sum(log(x))`` of one row is ``log(x)``;
    ``min_by``/``min``/``sum`` of one row are the row) — bit-exact, no
    shuffle.  The re-aggregation exchange then carries only the affected
    rows, which are ontology-bounded in share, not turn-bounded.
    """
    mapping = canonical_mapping(relationships)
    cid_type = dict(mapping.dtypes)["canonical_concept_id"]
    # effects table: source ids (rewritten) + target ids (mergeable-into);
    # the two sets are disjoint (a canonical target never rewrites)
    effects = mapping.unionByName(
        mapping.select(F.col("canonical_concept_id").alias("concept_id"))
        .distinct()
        .withColumn("canonical_concept_id", F.lit(None).cast(cid_type))
    )
    joined = facts.join(
        F.broadcast(effects), facts.omop_concept_id == effects.concept_id, "left"
    )
    untouched = joined.filter(F.col("concept_id").isNull()).drop(
        "concept_id", "canonical_concept_id"
    )
    touched = (
        joined.filter(F.col("concept_id").isNotNull())
        .withColumn("omop_concept_id", F.coalesce("canonical_concept_id", "omop_concept_id"))
        .drop("concept_id", "canonical_concept_id")
    )
    re_agg = (
        touched.groupBy("conv_id", "omop_concept_id", "assertion", "temporality", "experiencer")
        .agg(
            F.expr("min_by(concept_name, first_turn_idx * 100000000L + first_start_offset)").alias("concept_name"),
            F.expr("min_by(domain, first_turn_idx * 100000000L + first_start_offset)").alias("domain"),
            (1.0 - F.exp(F.sum(F.log(F.greatest(1.0 - F.col("confidence"), F.lit(1e-15)))))).alias("confidence"),
            F.sum("evidence_count").alias("evidence_count"),
            F.min("first_turn_idx").alias("first_turn_idx"),
            F.min("first_start_offset").alias("first_start_offset"),
        )
    )
    passthrough = untouched.select(
        "conv_id", "omop_concept_id", "assertion", "temporality", "experiencer",
        "concept_name", "domain",
        (1.0 - F.exp(F.log(F.greatest(1.0 - F.col("confidence"), F.lit(1e-15))))).alias("confidence"),
        "evidence_count", "first_turn_idx", "first_start_offset",
    )
    return re_agg.unionByName(passthrough)
