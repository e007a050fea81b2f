"""Similarity search: brute-force cosine top-k + LSH-bucketed ANN."""

import math

import pytest
from pyspark.sql import functions as F, types as T

from kgnorm import vecops

DIM = 8


@pytest.fixture(scope="module")
def embeddings(spark):
    import random

    rng = random.Random(3)
    rows = []
    for i in range(40):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(DIM)], i % 4))
    # vec 41 = exact copy of vec 0 (must be its top neighbor, cos=1)
    rows.append((41, list(rows[0][1]), 0))
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ])
    return spark.createDataFrame(rows, schema)


def _py_topk(rows, n_queries, k):
    import itertools

    vecs = {r[0]: [float(x) for x in r[1]] for r in rows}
    # float32 storage: round-trip through struct to match parquet floats is
    # unnecessary here because the fixture passes the same floats to Spark
    out = {}
    for q in range(n_queries):
        scored = []
        for v, emb in vecs.items():
            if v == q:
                continue
            dot = na = nb = 0.0
            for x, y in zip(vecs[q], emb):
                dot += x * y
            na = math.sqrt(sum(x * x for x in vecs[q]))
            nb = math.sqrt(sum(x * x for x in emb))
            scored.append((round(dot / (na * nb), 6), -v))
        scored.sort(reverse=True)
        out[q] = [(-v, s) for s, v in scored[:k]]
    return out


def test_exact_copy_is_top1(spark, embeddings):
    got = vecops.cosine_topk(embeddings, n_queries=1, k=3).collect()
    top = [r for r in got if r.rk == 1][0]
    assert top.vec_id == 41
    assert top.cos6 == pytest.approx(1.0)


def test_topk_matches_python_reference(spark, embeddings):
    got = vecops.cosine_topk(embeddings, n_queries=5, k=5).collect()
    # python reference on float32-truncated values
    rows = [(r.vec_id, [float(x) for x in r.embedding]) for r in embeddings.collect()]
    want = _py_topk(rows, 5, 5)
    for q in range(5):
        got_q = sorted([(r.rk, r.vec_id) for r in got if r.query_id == q])
        want_q = [(i + 1, v) for i, (v, s) in enumerate(want[q])]
        assert got_q == want_q, f"query {q}"


def test_lsh_bucket_properties(spark, embeddings):
    b = vecops.lsh_buckets(embeddings, DIM).collect()
    assert all(len(r.bucket) == 4 and set(r.bucket) <= {"0", "1"} for r in b)
    by_id = {r.vec_id: r.bucket for r in b}
    assert by_id[0] == by_id[41]  # identical vectors share every bucket


def test_ann_finds_identical_copy(spark, embeddings):
    approx = vecops.ann_lsh_topk(embeddings, DIM, n_queries=5, k=3).collect()
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    # identical-copy neighbor is always found (every band matches)
    assert (0, 41) in approx_set


def test_ann_recall_at_operating_point(spark):
    """Banded LSH is designed for high-similarity retrieval (near-dups):
    plant noisy copies of each query and require ≥0.8 recall on them."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(10):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(DIM)], 0))
    # 3 noisy near-copies per query (cosine ≈ 0.99)
    nid = 100
    planted = {}
    for q in range(10):
        planted[q] = []
        for _ in range(3):
            noisy = [x + rng.uniform(-0.02, 0.02) for x in rows[q][1]]
            rows.append((nid, noisy, 0))
            planted[q].append(nid)
            nid += 1
    # background noise vectors
    for i in range(200, 260):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(DIM)], 0))
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ])
    df = spark.createDataFrame(rows, schema)
    approx = vecops.ann_lsh_topk(df, DIM, n_queries=10, k=3).collect()
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    want = {(q, v) for q, vs in planted.items() for v in vs}
    recall = len(want & approx_set) / len(want)
    assert recall >= 0.8, f"recall {recall}"


def test_banded_lsh_shapes(spark, embeddings):
    b = vecops.lsh_bands(embeddings, DIM, n_bits=32, bands=4).collect()
    # 41 vectors x 4 bands
    assert len(b) == 41 * 4
    assert all(len(r.band_bucket) == 8 and set(r.band_bucket) <= {"0", "1"} for r in b)
    by_key = {(r.vec_id, r.band_idx): r.band_bucket for r in b}
    # identical vectors share every band
    for band in range(4):
        assert by_key[(0, band)] == by_key[(41, band)]


def test_banded_ann_no_duplicate_candidates(spark, embeddings):
    got = vecops.ann_lsh_topk(embeddings, DIM, n_queries=3, k=50).collect()
    seen = set()
    for r in got:
        assert (r.query_id, r.vec_id) not in seen  # OR-amplification deduped
        seen.add((r.query_id, r.vec_id))


def test_lsh_dup_pairs_finds_identical_and_near(spark, embeddings):
    got = {(r.vec_a, r.vec_b): r.cos6 for r in vecops.lsh_dup_pairs(embeddings, DIM, threshold=0.9).collect()}
    assert (0, 41) in got           # exact copy, every band collides
    assert got[(0, 41)] == pytest.approx(1.0)
    assert all(c >= 0.9 for c in got.values())
    assert all(a < b for a, b in got)
