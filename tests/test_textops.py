"""Training-data text ops: dedup, quality, lang-id, tokens, fingerprints."""

import pytest
from pyspark.sql import functions as F

from kgnorm import textops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat", "en", "s0", 22),
        (1, "the cat sat on the mat", "en", "s1", 22),          # exact dup of 0
        (2, "the cat sat on the red mat", "en", "s0", 26),       # near dup
        (3, "el perro y el gato en la casa", "es", "s1", 29),
        (4, "completely different text about spark joins", "en", "s0", 44),
        (5, "x", "en", "s1", 1),                                 # degenerate
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")


def test_exact_dup_groups(spark, docs):
    got = textops.exact_dup_groups(docs).collect()
    assert len(got) == 1
    assert got[0].n_docs == 2 and got[0].canonical_doc_id == 0


def test_minhash_identical_docs_share_signature(spark, docs):
    sigs = {r.doc_id: tuple(r[f"sig_{i}"] for i in range(8)) for r in textops.minhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[4]


def test_minhash_lsh_finds_exact_and_near_dups(spark, docs):
    pairs = {(r.doc_a, r.doc_b) for r in textops.minhash_lsh_pairs(docs).collect()}
    assert (0, 1) in pairs  # identical docs always collide
    assert all(a < b for a, b in pairs)


def test_ngram_jaccard_pairs(spark, docs):
    got = {(r.doc_a, r.doc_b): r.jaccard6 for r in textops.ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    assert got[(0, 1)] == 1.0
    # doc 2 shares shingles with 0/1: shingles(0)=4, shingles(2)=5 w/ 3-grams,
    # shared = |{'the cat sat','cat sat on','sat on the'}| = 3 → 3/(4+5-3)=0.5
    assert got[(0, 2)] == pytest.approx(0.5)


def test_simhash_identical_docs_equal_and_close_docs_near(spark, docs):
    sh = {r.doc_id: r.simhash for r in textops.simhash(docs).collect()}
    assert sh[0] == sh[1]
    ham_near = sum(a != b for a, b in zip(sh[0], sh[2]))
    ham_far = sum(a != b for a, b in zip(sh[0], sh[4]))
    assert ham_near <= ham_far
    assert len(sh[0]) == 16 and set(sh[0]) <= {"0", "1"}


def test_text_quality(spark, docs):
    q = {r.doc_id: r for r in textops.text_quality(docs).collect()}
    assert q[0].n_tokens == 6
    assert q[0].stopword_ratio6 == pytest.approx(round(2 / 6, 6))  # the, the
    assert 0.0 <= q[5].quality6 <= 1.0
    assert q[4].quality6 <= 1.0


def test_lang_id(spark, docs):
    p = {r.doc_id: r.predicted_lang for r in textops.lang_id(docs).collect()}
    assert p[0] == "en"
    assert p[3] == "es"
    assert p[5] == "unknown"


def test_token_stats(spark, docs):
    s = {r.source: r for r in textops.token_stats(docs).collect()}
    assert s["s0"].n_docs == 3
    assert s["s0"].ws_tokens == 6 + 7 + 6
    # bpe tokens ≥ ws tokens always (splits on punctuation too)
    assert s["s1"].bpe_tokens >= s["s1"].ws_tokens


def test_fingerprints(spark, docs):
    fp = {r.doc_id: r for r in textops.fingerprints(docs).collect()}
    assert fp[0].content_fp == fp[1].content_fp
    assert fp[0].minshingle_fp == fp[1].minshingle_fp
    assert fp[0].content_fp != fp[4].content_fp
    assert fp[5].minshingle_fp is not None  # degenerate short doc falls back


def test_ngram_jaccard_df_cap_bounds_candidates(spark):
    # skewed corpus: one boilerplate shingle shared by every doc; with the
    # df cap the hot shingle is dropped from the inverted index and the
    # join produces no quadratic pair blow-up (VERDICT r01 scale fix)
    rows = [(i, f"standard header boilerplate line unique{i} tail{i} extra{i}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = textops.ngram_jaccard_pairs(docs, threshold=0.0).collect()
    capped = textops.ngram_jaccard_pairs(docs, threshold=0.0, df_max=10).collect()
    assert len(uncapped) == 30 * 29 // 2  # every pair shares the boilerplate
    assert len(capped) == 0               # hot shingles dropped -> no pairs
    stats = textops.hot_shingle_stats(docs, df_max=10).collect()[0]
    assert stats.n_hot >= 1 and stats.max_df == 30


def test_ngram_jaccard_df_cap_keeps_cold_pairs(spark):
    rows = [
        (0, "alpha beta gamma delta"),
        (1, "alpha beta gamma delta"),
        (2, "unrelated words entirely here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.jaccard6 for r in textops.ngram_jaccard_pairs(docs, threshold=0.5, df_max=10).collect()}
    assert got == {(0, 1): 1.0}
