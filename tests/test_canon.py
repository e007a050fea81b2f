"""Connected-components canonicalization tests (SURVEY §2.4 cross-vocab row)."""

from pyspark.sql import functions as F

from kgnorm import canon, schemas


def _rels(spark, rows):
    return spark.createDataFrame(
        [{"concept_id_1": a, "concept_id_2": b, "relationship_id": r} for a, b, r in rows],
        schema=schemas.CONCEPT_RELATIONSHIPS,
    )


def test_single_hop_matches_reference_semantics(spark):
    # reference does single-hop 'Maps to' (vocabulary_mapping.py:302-352);
    # CC must converge to the same answer on single-hop data.
    rels = _rels(spark, [(100, 1, "Maps to"), (200, 2, "Maps to")])
    got = {r.concept_id: r.canonical_concept_id for r in canon.canonical_mapping(rels).collect()}
    assert got == {100: 1, 200: 2}


def test_two_hop_chain_converges_to_terminal(spark):
    rels = _rels(spark, [(300, 200, "Maps to"), (200, 1, "Maps to")])
    got = {r.concept_id: r.canonical_concept_id for r in canon.canonical_mapping(rels).collect()}
    # terminal of the chain is 1 (never a 'Maps to' source)
    assert got == {300: 1, 200: 1}


def test_mapped_from_is_undirected_alias(spark):
    rels = _rels(spark, [(1, 400, "Mapped from")])  # standard 1 'mapped from' source 400
    comps = canon.connected_components(canon.alias_edges(rels)).collect()
    assert len({r.component_id for r in comps}) == 1


def test_hot_concept_many_aliases(spark):
    rels = _rels(spark, [(1000 + i, 5, "Maps to") for i in range(50)])
    got = {r.concept_id: r.canonical_concept_id for r in canon.canonical_mapping(rels).collect()}
    assert all(v == 5 for v in got.values())
    assert len(got) == 50


def test_canonicalize_facts_merges(spark):
    rels = _rels(spark, [(100, 1, "Maps to")])
    facts = spark.createDataFrame(
        [
            ("C1", 100, "Alias name", "condition", "present", "current", "patient", 0.6, 1, 0, 0),
            ("C1", 1, "Standard name", "condition", "present", "current", "patient", 0.8, 1, 0, 5),
        ],
        "conv_id string, omop_concept_id long, concept_name string, domain string,"
        " assertion string, temporality string, experiencer string, confidence double,"
        " evidence_count long, first_turn_idx int, first_start_offset int",
    )
    got = canon.canonicalize_facts(facts, rels).collect()
    assert len(got) == 1
    f = got[0]
    assert f.omop_concept_id == 1
    assert f.evidence_count == 2
    assert abs(f.confidence - (1 - 0.4 * 0.2)) < 1e-9
