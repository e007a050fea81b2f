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


def concept_embeddings(spark: SparkSession, concepts: list[dict], dim: int = EMB_DIM) -> DataFrame:
    """Concept-embedding dimension table (driver-side build, like the
    reference's vocabulary-load-time _build_embeddings)."""
    rows = [
        (c["concept_id"], c["concept_name"], c.get("domain_id"),
         c.get("vocabulary_id"), hash_embed(c["concept_name"], dim))
        for c in concepts
    ]
    schema = T.StructType([
        T.StructField("concept_id", T.LongType()),
        T.StructField("concept_name", T.StringType()),
        T.StructField("domain_id", T.StringType()),
        T.StructField("vocabulary_id", T.StringType()),
        T.StructField("emb", T.ArrayType(T.DoubleType())),
    ])
    return spark.createDataFrame(rows, schema)


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def semantic_candidates(
    terms: DataFrame,
    concept_emb: DataFrame,
    top_k: int = SEMANTIC_TOP_K,
    threshold: float = SEMANTIC_THRESHOLD,
    dim: int = EMB_DIM,
) -> DataFrame:
    """Semantic tier: term → top-k concepts by cosine ≥ threshold.

    Output: (term, concept_id, concept_name, vocabulary_id, domain_id,
    score, method='semantic', rank).  Score = cosine × 0.85, rounded to
    6 dp for engine-portable ranking."""
    def _encode(col: pd.Series) -> pd.Series:
        return col.map(lambda t: hash_embed(t if t is not None else "", dim))

    encode = F.pandas_udf(_encode, T.ArrayType(T.DoubleType()))

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
