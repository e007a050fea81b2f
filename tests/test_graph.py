"""Graph materialization tests (reference: graph_builder_db.py; SURVEY §2.11)."""

from pyspark.sql import functions as F

from kgnorm import graph


def _facts(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, omop_concept_id long, concept_name string, domain string,"
        " assertion string, temporality string, experiencer string, confidence double,"
        " evidence_count long, first_turn_idx int, first_start_offset int",
    )


def test_hub_node_per_conversation(spark):
    f = _facts(spark, [
        ("C1", 1, "Cough", "condition", "present", "current", "patient", 0.9, 1, 0, 0),
        ("C1", 2, "Fever", "condition", "present", "current", "patient", 0.9, 1, 0, 5),
        ("C2", 1, "Cough", "condition", "present", "current", "patient", 0.9, 1, 0, 0),
    ])
    hubs = graph.hub_nodes(f).collect()
    assert len(hubs) == 2
    assert all(h.node_type == "patient" for h in hubs)


def test_node_edge_dedup_and_types(spark):
    f = _facts(spark, [
        ("C1", 10, "Metformin", "drug", "present", "current", "patient", 0.9, 1, 0, 0),
        # same concept again with different assertion → same node dedup key
        ("C1", 10, "Metformin", "drug", "absent", "current", "patient", 0.5, 1, 2, 0),
        ("C1", 20, "HbA1c", "measurement", "present", "current", "patient", 0.9, 1, 1, 0),
    ])
    nodes = graph.concept_nodes(f).collect()
    edges = graph.build_edges(f).collect()
    assert len(nodes) == 2  # dedup on (conv, node_type, concept)
    met = [n for n in nodes if n.omop_concept_id == 10][0]
    # first fact (turn 0) wins the properties
    assert met.properties["assertion"] == "present"
    assert met.properties["is_negated"] == "false"
    assert len(edges) == 2
    types = {e.edge_type for e in edges}
    assert types == {"takes_drug", "has_measurement"}


def test_device_maps_to_observation(spark):
    f = _facts(spark, [
        ("C1", 30, "Pacemaker", "device", "present", "current", "patient", 0.9, 1, 0, 0),
    ])
    triples = graph.build_triples(f).collect()
    assert triples[0].pred == "has_observation"


def test_negated_triple_emitted(spark):
    f = _facts(spark, [
        ("C1", 7, "Pneumonia", "condition", "absent", "current", "patient", 0.9, 1, 0, 0),
    ])
    t = graph.build_triples(f).collect()
    assert len(t) == 1
    assert t[0].assertion == "absent"
    assert t[0].pred == "has_condition"
    assert t[0].obj == "concept:7"


def test_deterministic_ids(spark):
    rows = [("C1", 1, "Cough", "condition", "present", "current", "patient", 0.9, 1, 0, 0)]
    a = graph.build_nodes(_facts(spark, rows)).collect()
    b = graph.build_nodes(_facts(spark, rows)).collect()
    assert sorted(n.node_id for n in a) == sorted(n.node_id for n in b)


def test_prepared_first_facts_equivalence(spark):
    """nodes/edges/triples built from a shared first_facts base must equal
    the direct per-output window path."""
    f = _facts(spark, [
        ("C1", 10, "Metformin", "drug", "present", "current", "patient", 0.9, 1, 0, 0),
        ("C1", 10, "Metformin", "drug", "absent", "current", "patient", 0.5, 1, 2, 0),
        ("C1", 30, "Pacemaker", "device", "present", "current", "patient", 0.9, 1, 1, 0),
        ("C2", 30, "Obs", "observation", "absent", "past", "family", 0.7, 1, 0, 0),
    ])
    base = graph.first_facts(f)
    for fn in (graph.build_nodes, graph.build_edges, graph.build_triples):
        direct = sorted(map(tuple, fn(f).collect()))
        shared = sorted(map(tuple, fn(base, prepared=True).collect()))
        assert direct == shared, fn.__name__


def test_edges_reference_existing_nodes(spark):
    f = _facts(spark, [
        ("C1", 1, "Cough", "condition", "present", "current", "patient", 0.9, 1, 0, 0),
        ("C2", 2, "Fever", "condition", "absent", "past", "family", 0.8, 1, 0, 0),
    ])
    nodes = {n.node_id for n in graph.build_nodes(f).collect()}
    for e in graph.build_edges(f).collect():
        assert e.source_node_id in nodes
        assert e.target_node_id in nodes
