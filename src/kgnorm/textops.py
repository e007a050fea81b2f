"""Large-scale training-data text operations over a ``documents`` table.

These are the operations a 100-TB training-data pipeline needs around
the KG engine: deduplication (exact, MinHash-LSH, SimHash, n-gram
Jaccard), text quality scoring, language ID, token counting, and
document fingerprinting.  Everything here is built from JVM-side
``pyspark.sql.functions`` only — no Python UDFs — so plans stay inside
whole-stage codegen and scale linearly; each op has an exact ANSI-SQL
twin in ``__spark_entry__.oracle_sql``.

Hash design note: cross-engine-verifiable ops use ``md5`` (identical
lowercase-hex output in Spark and DuckDB).  MinHash uses the MINIMUM of
``md5(seed || shingle)`` hex strings per seed — an order statistic over
a uniform hash, which is the standard MinHash construction with string
ordering standing in for integer ordering.  SimHash extracts 16 bit
signals from the parity of the first 16 md5 hex characters of each
token.  At production scale you'd swap md5 for ``xxhash64`` (Spark) —
the structure (explode → min-agg → band-bucket join) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# ---------------------------------------------------------------------------
# tokenization helpers (expression builders, no UDFs)
# ---------------------------------------------------------------------------


def ws_tokens(col):
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(col), r"\s+")


def word_shingles(col, n: int = 3):
    """Distinct n-word shingles; falls back to the whole text when shorter."""
    toks = ws_tokens(col)
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        ),
    ).otherwise(F.array(F.trim(col)))


def normalized_text(col):
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------


def exact_dup_groups(documents: DataFrame) -> DataFrame:
    """Exact dedup via hash-groupBy: one row per duplicated text."""
    return (
        documents.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("canonical_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def minhash_signatures(documents: DataFrame, k: int = 8, shingle_n: int = 3) -> DataFrame:
    """k-permutation MinHash signature per document (long format).

    Plan: explode distinct shingles → for each seed, min(md5(seed|shingle))
    — a single partial+final hash agg per doc, no shuffle beyond the
    groupBy on doc_id.
    """
    sh = documents.select("doc_id", F.explode(word_shingles(F.col("text"), shingle_n)).alias("shingle"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"sig_{i}")
        for i in range(k)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(documents: DataFrame, k: int = 8, bands: int = 4, shingle_n: int = 3) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    rows/band = k/bands; a pair collides if ANY band's concatenated
    signature matches.  The band bucket join is an equi shuffle join on
    (band_idx, bucket) — skew-safe because identical docs are the only
    hot buckets and AQE splits them.
    """
    rows_per_band = k // bands
    sigs = minhash_signatures(documents, k, shingle_n)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band_idx"), F.md5(F.concat_ws("|", *parts)).alias("bucket")))
    banded = sigs.select("doc_id", F.explode(F.array(*band_cols)).alias("band")).select(
        "doc_id", F.col("band.band_idx").alias("band_idx"), F.col("band.bucket").alias("bucket")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band_idx", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    shingle_n: int = 3,
    threshold: float = 0.7,
    df_max: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via shingle-inverted-index join.

    |A∩B| from the shingle self-join, |A|,|B| from per-doc counts;
    jaccard = shared / (|A| + |B| - shared).  The shingle join is the
    classic inverted-index block join — no O(n²) pair enumeration.

    ``df_max`` (document-frequency cap): a boilerplate shingle shared by
    m documents contributes m² rows to the self-join — one hot shingle in
    10⁶ docs is a 10¹² blow-up (VERDICT r01).  With ``df_max`` set, hot
    shingles are dropped from BOTH the intersection and the per-doc union
    counts (standard df/prefix filtering), so the jaccard stays internally
    consistent over the filtered shingle space; use
    :func:`hot_shingle_stats` to report how many were dropped.
    """
    sh = documents.select("doc_id", F.explode(word_shingles(F.col("text"), shingle_n)).alias("shingle"))
    if df_max is not None:
        # df via a window on the shingle key (ONE shuffle, no recompute of
        # the exploded subtree; the self-join below reuses the same
        # partitioning) — a groupBy+join formulation would re-derive the
        # shingle explode once per reference and broadcast an unbounded
        # distinct-shingle table
        w = Window.partitionBy("shingle")
        sh = (
            sh.withColumn("_df", F.count(F.lit(1)).over(w))
            .filter(F.col("_df") <= df_max)
            .drop("_df")
        )
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn("jaccard", F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "shared", "n_a", "n_b", F.round("jaccard", 6).alias("jaccard6"))
    )


def hot_shingle_stats(documents: DataFrame, shingle_n: int = 3, df_max: int = 100) -> DataFrame:
    """Drop-metrics companion to the ``df_max`` cap: one row
    ``(n_shingles, n_hot, max_df)`` so callers can log what a given cap
    would exclude before running the pair join."""
    sh = documents.select("doc_id", F.explode(word_shingles(F.col("text"), shingle_n)).alias("shingle"))
    df = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    return df.agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.when(F.col("df") > df_max, 1).otherwise(0)).alias("n_hot"),
        F.max("df").alias("max_df"),
    )


def simhash(documents: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash fingerprint: per bit, the sign of the sum of ±1 votes from
    each distinct token's hash bit (parity of md5 hex char ``b``)."""
    toks = documents.select("doc_id", F.explode(F.array_distinct(ws_tokens(F.col("text")))).alias("tok"))
    votes = [
        F.sum(
            (F.ascii(F.substring(F.md5("tok"), b + 1, 1)) % 2) * 2 - 1
        ).alias(f"v_{b}")
        for b in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    bitstr = F.concat(*[F.when(F.col(f"v_{b}") >= 0, F.lit("1")).otherwise(F.lit("0")) for b in range(bits)])
    return agg.select("doc_id", bitstr.alias("simhash"))


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

_STOP_EN = ["the", "a", "an", "of", "and", "or", "is", "was", "to", "in"]

_LANG_PROFILES = {
    "en": ["the", "and", "of", "is", "was", "with", "for", "on"],
    "es": ["el", "la", "de", "y", "en", "los", "que", "un"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit"],
    "fr": ["le", "la", "les", "et", "des", "est", "un", "une"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1"],
}


def text_quality(documents: DataFrame) -> DataFrame:
    """Length / punctuation / stopword quality signals + composite score."""
    toks = ws_tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*_STOP_EN)))
    punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[^A-Za-z0-9\s]"), 0))
    d = documents.select(
        "doc_id",
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        (n_chars / n_tokens).alias("avg_token_span"),
        (stop_hits / n_tokens).alias("stopword_ratio"),
        (punct / n_chars).alias("punct_ratio"),
    )
    score = (
        F.when(F.col("n_tokens") >= 20, F.lit(1.0)).otherwise(F.col("n_tokens") / 20.0) * 0.4
        + F.when(F.col("stopword_ratio") > 0.02, F.lit(1.0)).otherwise(F.lit(0.5)) * 0.3
        + (1.0 - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))) * 0.3
    )
    return d.select(
        "doc_id", "n_chars_m", "n_tokens",
        F.round("avg_token_span", 6).alias("avg_token_span6"),
        F.round("stopword_ratio", 6).alias("stopword_ratio6"),
        F.round("punct_ratio", 6).alias("punct_ratio6"),
        F.round(score, 6).alias("quality6"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-profile language ID (n-gram heuristic).

    Deterministic tie policy: first language in en>es>de>fr>zh precedence
    whose score equals the max.
    """
    toks = ws_tokens(F.col("text"))

    def profile_hits(words):
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    scores = {lang: profile_hits(words) for lang, words in _LANG_PROFILES.items()}
    d = documents.select("doc_id", "lang", *[v.alias(f"s_{k}") for k, v in scores.items()])
    order = ["en", "es", "de", "fr", "zh"]
    mx = F.greatest(*[F.col(f"s_{k}") for k in order])
    pred = F.lit("unknown")
    for k in reversed(order):
        pred = F.when(F.col(f"s_{k}") == mx, F.lit(k)).otherwise(pred)
    pred = F.when(mx <= 0, F.lit("unknown")).otherwise(pred)
    return d.select("doc_id", F.col("lang").alias("declared_lang"), pred.alias("predicted_lang"),
                    *[F.col(f"s_{k}") for k in order])


def token_stats(documents: DataFrame) -> DataFrame:
    """Per-source token accounting: whitespace tokens and BPE-ish subword
    pieces (letter runs / digit runs / single punctuation)."""
    ws = F.size(ws_tokens(F.col("text")))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))
    per_doc = documents.select("source", ws.alias("n_ws"), bpe.alias("n_bpe"))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_ws").alias("ws_tokens"),
            F.sum("n_bpe").alias("bpe_tokens"),
            F.round(F.avg("n_ws"), 6).alias("avg_ws_tokens6"),
        )
    )


def fingerprints(documents: DataFrame, shingle_n: int = 3) -> DataFrame:
    """Content fingerprint (md5 of normalized text) + min-shingle-hash
    fingerprint (rolling-window document sketch)."""
    return documents.select(
        "doc_id",
        F.md5(normalized_text(F.col("text"))).alias("content_fp"),
        F.array_min(
            F.transform(word_shingles(F.col("text"), shingle_n), lambda s: F.md5(s))
        ).alias("minshingle_fp"),
    )


def dup_clusters(pairs: DataFrame) -> DataFrame:
    """Near-duplicate CLUSTERS from candidate pairs: connected
    components over the (doc_a, doc_b) edge list.

    This is the tail of the 100-TB dedup pipeline the pair generators
    (minhash_lsh_pairs / ngram_jaccard_pairs / embedding_dup_pairs)
    feed: transitive closure groups A~B~C into one cluster even when
    (A, C) never collided in any band.  Reuses the salted hash-min
    label propagation the ontology canonicalization runs
    (kgnorm/canon.py:45) — same convergence and skew properties.

    Output: (doc_id, cluster_id) for every doc that appears in a pair;
    cluster_id = min doc id of the component.
    """
    from kgnorm.canon import connected_components

    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(pairs.select(
        F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    return connected_components(edges).select(
        F.col("concept_id").alias("doc_id"),
        F.col("component_id").alias("cluster_id"),
    )


def dedup_keep_canonical(documents: DataFrame, clusters: DataFrame) -> DataFrame:
    """Keep one representative per near-dup cluster (min doc_id),
    passing non-clustered docs through untouched — the materialization
    step that turns pair detection into an actual deduplicated corpus.

    One broadcast-or-shuffle left join against the (small) cluster
    table + a filter; no window over the corpus.
    """
    c = clusters.withColumn("_keep", F.col("doc_id") == F.col("cluster_id"))
    return (
        documents.join(c, "doc_id", "left")
        .filter(F.col("_keep").isNull() | F.col("_keep"))
        .drop("_keep")
    )
