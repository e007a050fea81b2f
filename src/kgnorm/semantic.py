"""Semantic (embedding) mention→concept linking tier.

Port of the reference's hybrid-search semantic path
(``backend/app/services/hybrid_search.py:195-268``): encode the query
term, cosine-score it against the concept-embedding matrix, keep scores
≥ 0.6, multiply by the 0.85 semantic-confidence multiplier
(hybrid_search.py:31), return top-k sorted by score.

**Encoder stand-in.**  The reference encodes with a sentence-transformer
(``all-MiniLM-L6-v2``, embedding_service.py:16) that is not installed in
this environment — the reference itself raises/degrades when the model
is absent (embedding_service.py:58-68).  :func:`hash_embed` is a
deterministic character-trigram hashing encoder used for BOTH concept
names and query terms, so similarity means shared character n-grams
(a lexical-overlap proxy).  Swapping in a real model is a one-function
change; every downstream piece — broadcast concept matrix, JVM-side
cosine, threshold, multiplier, top-k window — is the real Spark plan.

Scale shape: the concept matrix is ontology-bounded (≤150k × dim
doubles ≈ 77 MB at dim 64 — broadcastable); term encoding is an
Arrow-batched pandas UDF (the encode step is Python in the reference
too); scoring joins broadcast-side, so the only shuffle is the per-term
top-k window.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql import types as T

EMB_DIM = 64
SEMANTIC_THRESHOLD = 0.6          # hybrid_search.py:199
SEMANTIC_TOP_K = 10               # hybrid_search.py:198
SEMANTIC_SCORE_MULTIPLIER = 0.85  # hybrid_search.py:31

_MASK = (1 << 32) - 1


def hash_embed(text: str, dim: int = EMB_DIM) -> list[float]:
    """Deterministic char-trigram hashing embedding, L2-normalized.

    Mirrors the reference's encode-side normalization (strip + lower,
    embedding_service.py:83); zero-vector for empty text (:84-85)."""
    t = text.strip().lower()
    if not t:
        return [0.0] * dim
    padded = f"^{t}$"
    buckets = [0.0] * dim
    for i in range(len(padded) - 2):
        h = 2166136261
        for ch in padded[i:i + 3]:
            h = ((h ^ ord(ch)) * 16777619) & _MASK
        buckets[h % dim] += 1.0
    norm = sum(x * x for x in buckets) ** 0.5
    return [x / norm for x in buckets] if norm > 0 else buckets


def batch_hash_embed(texts: list[str], dim: int = EMB_DIM) -> list[list[float]]:
    """Batched stand-in matching the GPU-encoder contract (same shape a
    sentence-transformers ``model.encode(list[str])`` call has): one
    call per Arrow batch, one vector per input text."""
    return [hash_embed(t, dim) for t in texts]


def concept_embeddings(spark: SparkSession, concepts: list[dict], dim: int = EMB_DIM,
                       encode_fn=None) -> DataFrame:
    """Concept-embedding dimension table (driver-side build, like the
    reference's vocabulary-load-time _build_embeddings).

    ``encode_fn(texts: list[str]) -> list[list[float]]`` swaps in a real
    batched encoder; default is the deterministic trigram stand-in."""
    fn = encode_fn or (lambda ts: batch_hash_embed(ts, dim))
    embs = fn([c["concept_name"] for c in concepts])
    rows = [
        (c["concept_id"], c["concept_name"], c.get("domain_id"),
         c.get("vocabulary_id"), e)
        for c, e in zip(concepts, embs)
    ]
    schema = T.StructType([
        T.StructField("concept_id", T.LongType()),
        T.StructField("concept_name", T.StringType()),
        T.StructField("domain_id", T.StringType()),
        T.StructField("vocabulary_id", T.StringType()),
        T.StructField("emb", T.ArrayType(T.DoubleType())),
    ])
    return spark.createDataFrame(rows, schema)


def _encode_kernel(fn, dim: int = EMB_DIM):
    """Series→Series kernel issuing exactly ONE ``fn(list[str])`` call
    per Arrow batch (the GPU-encoder contract, same shape as
    kgnorm.ner._batch_kernel); None texts yield the zero vector without
    reaching the model."""

    def _encode(col: pd.Series) -> pd.Series:
        texts = [t for t in col if t is not None]
        vecs = iter(fn(texts)) if texts else iter(())
        zero = [0.0] * dim
        return col.map(lambda t: next(vecs) if t is not None else zero)

    return _encode


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def semantic_candidates(
    terms: DataFrame,
    concept_emb: DataFrame,
    top_k: int = SEMANTIC_TOP_K,
    threshold: float = SEMANTIC_THRESHOLD,
    dim: int = EMB_DIM,
    encode_fn=None,
) -> DataFrame:
    """Semantic tier: term → top-k concepts by cosine ≥ threshold.

    Output: (term, concept_id, concept_name, vocabulary_id, domain_id,
    score, method='semantic', rank).  Score = cosine × 0.85, rounded to
    6 dp for engine-portable ranking.

    ``encode_fn(texts: list[str]) -> list[list[float]]`` is the batched
    encoder hook (README "Model assets"): a real sentence-transformer
    gets ONE ``encode`` call per Arrow batch — loaded once per executor
    process — with the stand-in as default.  None texts embed as the
    zero vector without reaching the model."""
    fn = encode_fn or (lambda ts: batch_hash_embed(ts, dim))
    encode = F.pandas_udf(_encode_kernel(fn, dim), T.ArrayType(T.DoubleType()))

    tq = terms.select("term", encode(F.col("term")).alias("q_emb"))
    # both sides hash-embedded are unit-norm (or zero); guard zero norms
    # like the reference (hybrid_search.py:217-219, 241-247)
    qn = F.sqrt(_dot(F.col("q_emb"), F.col("q_emb")))
    cn = F.sqrt(_dot(F.col("emb"), F.col("emb")))
    scored = (
        tq.join(F.broadcast(concept_emb))
        .filter((qn > 0) & (cn > 0))
        .select(
            "term", "concept_id", "concept_name", "vocabulary_id", "domain_id",
            (_dot(F.col("q_emb"), F.col("emb")) / (qn * cn)).alias("cos"),
        )
        # reference order: threshold on the RAW cosine, multiplier after
        # (hybrid_search.py:252-261)
        .filter(F.col("cos") >= threshold)
        .select(
            "term", "concept_id", "concept_name", "vocabulary_id", "domain_id",
            F.round(F.col("cos") * F.lit(SEMANTIC_SCORE_MULTIPLIER), 6).alias("score"),
        )
    )
    w = Window.partitionBy("term").orderBy(F.desc("score"), F.asc("concept_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("term", "concept_id", "concept_name", "vocabulary_id", "domain_id",
                "score", F.lit("semantic").alias("method"), "rank")
    )
