"""Semantic QA / search services: TF-IDF keyword search, TF-IDF-vector
semantic search, hybrid merge, fact search and concept-relation lookup.

Port of ``backend/app/services/semantic_qa.py``:

* tokenize = ``\\b\\w+\\b`` lower (:129-131);
* idf = ln(n_docs / (df + 1)) + 1 (:143-153);
* keyword scoring (:319-356): per overlap token,
  tf = SUBSTRING-count of the token in the lowercased content divided
  by the WHITESPACE-split length (both reference quirks preserved:
  'art' counts inside 'heart'; the denominator is ``len(content.split())``,
  not the token count), score capped at 1.0;
* semantic scoring (:357-389): cosine of tf·idf-weighted vectors;
* hybrid merge (:391-409): mean of the two scores when a doc appears in
  both result sets, passthrough otherwise;
* min_score 0.1 / max_results 10 (:259-306);
* concept-relation search (:662-750): fact-pair inference
  (condition×drug → 'treats', measurement×condition → 'monitors') with
  (source, relationship, target) dedup, capped at 20

and of ``semantic_search.py:55-121`` (search_clinical_facts): embedding
cosine ≥ threshold, top-k per query.

Spark-first: the corpus statistics (df / idf) are ONE groupBy over the
exploded token table; query↔doc scoring joins the tiny query-token dim
(broadcast) against the token table so only overlapping tokens are
scored — never an all-pairs cross join; top-k is a rank window.  The
reference's in-memory ``_documents`` dict scan is O(docs × queries) on
one thread.  Scores are rounded to 6 dp for engine-portable ranking,
with doc_id as the deterministic tie-break (the reference sorts by
score only, leaving ties in dict order).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql import types as T

MIN_SCORE = 0.1     # semantic_qa.py:264
MAX_RESULTS = 10    # semantic_qa.py:263
RELATION_CAP = 20   # semantic_qa.py:718

_TOKEN_SPLIT = "[^0-9A-Za-z_]+"  # \\w complement (ASCII corpus)


def _tokens(col):
    """``re.findall(r'\\b\\w+\\b', text.lower())`` as a JVM expression."""
    return F.filter(
        F.split(F.lower(col), _TOKEN_SPLIT), lambda t: F.length(t) > 0
    )


def doc_tokens(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(doc_id, token) exploded token table, one row per occurrence."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("token"),
    )


def idf_table(tokens: DataFrame, n_docs) -> DataFrame:
    """idf = ln(n_docs / (df + 1)) + 1 (semantic_qa.py:143-153).

    ``n_docs``: an int, or a 1-row DataFrame with an ``n_docs`` column
    (the lazy count-star corpus_index builds) — ONE formula definition
    for both forms so they cannot drift."""
    counts = tokens.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    if isinstance(n_docs, DataFrame):
        return counts.crossJoin(F.broadcast(n_docs)).select(
            "token",
            (F.log(F.col("n_docs").cast("double") / (F.col("df") + 1)) + 1.0).alias("idf"),
        )
    return counts.select(
        "token",
        (F.log(F.lit(float(n_docs)) / (F.col("df") + 1)) + 1.0).alias("idf"),
    )


def corpus_index(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text"):
    """(token table, idf table, n_docs DataFrame) — computed once and
    shared by both hybrid legs (each leg re-deriving the corpus
    statistics would scan and shuffle the 100-TB token table twice).

    ``n_docs`` is a lazy 1-row count-star aggregate broadcast into the
    idf table instead of an eager ``docs.count()`` action (r3 verdict
    efficiency note #3): no extra job per index build, and on parquet
    the count-star subquery is answered from row-group metadata — it
    never rereads the 100-TB text column.  It counts ALL docs
    (including token-less ones), matching the reference's
    ``len(self._documents)`` (semantic_qa.py:146)."""
    toks = doc_tokens(docs, id_col, text_col)
    ndf = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return toks, idf_table(toks, ndf), ndf


def _py_tokens(text: str) -> list[str]:
    """Driver-side twin of ``_tokens`` for the (tiny) query strings —
    identical on the ASCII corpus; used so the broadcast query-token dim
    and the per-doc substring-count map are keyed consistently by
    construction."""
    return [t for t in re.split(r"[^0-9A-Za-z_]+", text.lower()) if t]


def _query_tokens(spark: SparkSession, queries: list[str]) -> DataFrame:
    """Distinct (query, token) rows — set semantics like the reference's
    ``set(tokenize(query))`` (:320)."""
    rows = [(q, t) for q in queries for t in dict.fromkeys(_py_tokens(q))]
    return spark.createDataFrame(rows, "query string, token string")


def keyword_search(
    docs: DataFrame,
    spark: SparkSession,
    queries: list[str],
    min_score: float = MIN_SCORE,
    max_results: int = MAX_RESULTS,
    id_col: str = "doc_id",
    text_col: str = "text",
    ranked: bool = True,
    index=None,
) -> DataFrame:
    """TF-IDF keyword search (semantic_qa.py:319-356).

    ``ranked=False`` skips the per-query rank window entirely (for
    callers like hybrid_search that re-rank after merging — an uncapped
    rank over every scoring doc would funnel each query's candidates
    through one task for nothing).

    Scale shape (r3 verdict efficiency note #2): the substring counts
    for ALL broadcast query tokens are computed in ONE projection per
    doc (a token→count map column), so the join with the overlap table
    shuffles a bounded counts map — never the full document text once
    per overlapping token."""
    qtok_list = sorted({t for q in queries for t in _py_tokens(q)})
    tok_arr = (
        F.array(*[F.lit(t) for t in qtok_list])
        if qtok_list else F.array().cast("array<string>")
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.lower(F.col(text_col)).alias("_cl"),
        F.size(F.filter(F.split(F.col(text_col), "\\s+"),
                        lambda t: F.length(t) > 0)).alias("_nsplit"),
    ).select(
        "doc_id", "_nsplit",
        # substring-count of each query token in the lowercased text
        # (:331-335), all tokens in one pass over _cl
        F.map_from_arrays(
            tok_arr,
            F.transform(
                tok_arr,
                lambda t: (F.length("_cl") - F.length(F.replace(F.col("_cl"), t)))
                / F.length(t),
            ),
        ).alias("_qcnt"),
    )
    toks, idf, _n = index or corpus_index(docs, id_col, text_col)
    qt = F.broadcast(_query_tokens(spark, queries))

    # overlap = query tokens present in the doc's TOKEN SET; scoring then
    # substring-counts the token in the raw lowercased text (:331-335).
    # Join the broadcast query-token dim FIRST, then dedup: Catalyst will
    # not reorder a broadcast join below an Aggregate, so a pre-join
    # distinct would shuffle the ENTIRE exploded token table on every
    # search call.  Joining first prunes to query-overlapping tokens
    # map-side (broadcast), so the distinct's exchange carries only the
    # (query, doc_id, token) rows that actually score — query-sized, not
    # corpus-sized.  Same result set: per-occurrence duplicates collapse
    # in the distinct either way.
    overlap = toks.join(qt, "token").select("query", "doc_id", "token").distinct()
    scored = (
        overlap.join(F.broadcast(idf), "token", "left")
        .join(base, "doc_id")
        .select(
            "query", "doc_id",
            (
                F.element_at("_qcnt", F.col("token"))
                / F.col("_nsplit")
                * F.coalesce(F.col("idf"), F.lit(1.0))
            ).alias("_part"),
        )
        .groupBy("query", "doc_id")
        .agg(F.round(F.least(F.sum("_part"), F.lit(1.0)), 6).alias("score"))
        .filter(F.col("score") >= min_score)
    )
    if not ranked:
        return scored
    w = Window.partitionBy("query").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= max_results)
    )


def doc_vectors(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", index=None):
    """(dvec, dnorm): the per-document tf·idf vector rows
    ``(doc_id, token, w)`` and norms ``(doc_id, dn)`` the semantic leg
    scores against — tf = occurrences / doc token count
    (semantic_qa.py:134-141), weighted by the corpus idf.

    This is the SERVING-SIDE INDEX: at corpus scale these two tables
    are built once (one shuffle over the token table), written to
    parquet/Iceberg, and every subsequent query batch joins against the
    stored tables instead of re-aggregating the 100-TB token stream per
    call — pass them back in via ``semantic_search(vectors=...)`` /
    ``hybrid_search(vectors=...)``.  tests/test_semsearch.py pins that
    a parquet-round-tripped index returns identical results and that
    the query plan no longer scans the document text."""
    toks, idf_df, _n = index or corpus_index(docs, id_col, text_col)
    idf = F.broadcast(idf_df)
    dtf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("n"))
    dlen = toks.groupBy("doc_id").agg(F.count("*").alias("len"))
    dvec = (
        dtf.join(dlen, "doc_id")
        .join(idf, "token", "left")
        .select(
            "doc_id", "token",
            (F.col("n") / F.col("len") * F.coalesce("idf", F.lit(1.0))).alias("w"),
        )
    )
    dnorm = dvec.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("dn"))
    return dvec, dnorm


def semantic_search(
    docs: DataFrame,
    spark: SparkSession,
    queries: list[str],
    min_score: float = MIN_SCORE,
    max_results: int = MAX_RESULTS,
    id_col: str = "doc_id",
    text_col: str = "text",
    ranked: bool = True,
    index=None,
    vectors=None,
) -> DataFrame:
    """TF-IDF-vector cosine search (semantic_qa.py:357-389): both sides
    are tf·idf-weighted token vectors; cosine reduces to the sum over
    COMMON tokens of w_q·w_d over the norm product — computed sparsely
    via the token join, never materializing the dense vocab vector.

    ``vectors``: a prebuilt ``doc_vectors`` (dvec, dnorm) pair — the
    repeated-query serving path that skips the per-call corpus
    aggregation entirely."""
    toks, idf_df, _n = index or corpus_index(docs, id_col, text_col)
    idf = F.broadcast(idf_df)
    dvec, dnorm = vectors or doc_vectors(
        docs, id_col, text_col, index=(toks, idf_df, _n))

    # query vector, same construction (:362-370)
    qrows = spark.createDataFrame([(q,) for q in queries], ["query"])
    qtoks = qrows.select("query", F.explode(_tokens(F.col("query"))).alias("token"))
    qtf = qtoks.groupBy("query", "token").agg(F.count("*").alias("n"))
    qlen = qtoks.groupBy("query").agg(F.count("*").alias("len"))
    qvec = (
        qtf.join(qlen, "query")
        .join(idf, "token", "left")
        .select("query", "token",
                (F.col("n") / F.col("len") * F.coalesce("idf", F.lit(1.0))).alias("qw"))
    )
    qnorm = qvec.groupBy("query").agg(F.sqrt(F.sum(F.col("qw") * F.col("qw"))).alias("qn"))

    dots = (
        dvec.join(F.broadcast(qvec), "token")
        .groupBy("query", "doc_id")
        .agg(F.sum(F.col("w") * F.col("qw")).alias("dot"))
    )
    scored = (
        dots.join(F.broadcast(qnorm), "query")
        .join(dnorm, "doc_id")
        .filter((F.col("qn") > 0) & (F.col("dn") > 0))
        .select("query", "doc_id",
                F.round(F.col("dot") / (F.col("qn") * F.col("dn")), 6).alias("score"))
        .filter(F.col("score") > 0)
        .filter(F.col("score") >= min_score)
    )
    if not ranked:
        return scored
    w = Window.partitionBy("query").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= max_results)
    )


def hybrid_search(
    docs: DataFrame,
    spark: SparkSession,
    queries: list[str],
    min_score: float = MIN_SCORE,
    max_results: int = MAX_RESULTS,
    id_col: str = "doc_id",
    text_col: str = "text",
    index=None,
    vectors=None,
) -> DataFrame:
    """Hybrid merge (semantic_qa.py:391-409): mean of keyword and
    semantic scores when both found the doc, passthrough otherwise.
    The reference filters/caps AFTER merging (:299-303), so both legs
    run uncapped here (min_score 0, max_results unbounded) first.
    ``index`` / ``vectors``: prebuilt ``corpus_index`` / ``doc_vectors``
    for the repeated-query serving path."""
    idx = index or corpus_index(docs, id_col, text_col)
    kw = keyword_search(docs, spark, queries, 0.0, 1 << 30, id_col, text_col,
                        ranked=False, index=idx) \
        .select("query", "doc_id", F.col("score").alias("ks"))
    sem = semantic_search(docs, spark, queries, -1.0, 1 << 30, id_col, text_col,
                          ranked=False, index=idx, vectors=vectors) \
        .select("query", "doc_id", F.col("score").alias("ss"))
    merged = kw.join(sem, ["query", "doc_id"], "full").select(
        "query", "doc_id",
        F.round(
            F.when(F.col("ks").isNotNull() & F.col("ss").isNotNull(),
                   (F.col("ks") + F.col("ss")) / 2.0)
            .otherwise(F.coalesce("ks", "ss")), 6).alias("score"),
    ).filter(F.col("score") >= min_score)
    w = Window.partitionBy("query").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= max_results)
    )


def fact_search(
    facts: DataFrame,
    spark: SparkSession,
    queries: list[str],
    top_k: int = 10,
    threshold: float = 0.5,
) -> DataFrame:
    """Semantic fact search (semantic_search.py:55-121): hash-trigram
    embedding cosine between the query and each fact's concept name,
    ≥ threshold, top-k per query.  Dedup-before-join: only DISTINCT
    concept names are embedded and scored, then results fan back out to
    the fact rows."""
    from kgnorm import semantic

    encode = F.pandas_udf(
        semantic._encode_kernel(semantic.batch_hash_embed),
        T.ArrayType(T.DoubleType()))
    names = facts.select(F.col("concept_name").alias("name")).distinct() \
        .withColumn("emb", encode(F.col("name")))
    qdf = spark.createDataFrame([(q,) for q in queries], ["query"]) \
        .withColumn("q_emb", encode(F.col("query")))

    dot = F.aggregate(F.zip_with("q_emb", "emb", lambda x, y: x * y),
                      F.lit(0.0), lambda a, x: a + x)
    scored = (
        qdf.join(F.broadcast(names))
        .select("query", "name", F.round(dot, 6).alias("score"))
        .filter(F.col("score") >= threshold)
    )
    out = facts.select(
        "conv_id", F.col("concept_name").alias("name"), "domain",
        "assertion", "temporality", "omop_concept_id",
    ).join(F.broadcast(scored), "name")
    w = Window.partitionBy("query").orderBy(
        F.desc("score"), F.asc("conv_id"), F.asc("name"), F.asc("omop_concept_id"))
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query", "conv_id", "name", "domain", "assertion",
                "temporality", "omop_concept_id", "score", "rank")
    )


def concept_relations(
    facts: DataFrame,
    spark: SparkSession,
    concepts: list[str],
    cap: int = RELATION_CAP,
) -> DataFrame:
    """Concept-relation search over fact pairs (semantic_qa.py:662-750):
    for each queried concept, facts whose label contains it are paired
    with every OTHER fact in the same conversation and the relation is
    inferred from the domain pair (:722-750) — condition×drug → the
    drug 'treats' the condition, measurement×condition → 'monitors'.
    Dedup on (source, relationship, target); deterministic cap."""
    cdim = F.broadcast(spark.createDataFrame([(c,) for c in concepts], ["query_concept"]))
    base = facts.select(
        "conv_id", F.col("concept_name").alias("label"), "domain",
    )
    anchors = base.join(
        cdim, F.lower(F.col("label")).contains(F.lower(F.col("query_concept")))
    )
    others = base.select(
        F.col("conv_id"),
        F.col("label").alias("other_label"),
        F.col("domain").alias("other_domain"),
    )
    pairs = anchors.join(others, "conv_id").filter(
        (F.col("label") != F.col("other_label"))
        | (F.col("domain") != F.col("other_domain"))
    )
    rel = (
        pairs.select(
            "query_concept",
            F.when((F.col("domain") == "condition") & (F.col("other_domain") == "drug"),
                   F.struct(F.col("other_label").alias("source"),
                            F.lit("treats").alias("relationship"),
                            F.col("label").alias("target")))
            .when((F.col("domain") == "drug") & (F.col("other_domain") == "condition"),
                  F.struct(F.col("label").alias("source"),
                           F.lit("treats").alias("relationship"),
                           F.col("other_label").alias("target")))
            .when((F.col("domain") == "measurement") & (F.col("other_domain") == "condition"),
                  F.struct(F.col("label").alias("source"),
                           F.lit("monitors").alias("relationship"),
                           F.col("other_label").alias("target")))
            .alias("r"),
        )
        .filter(F.col("r").isNotNull())
        .select("query_concept", "r.source", "r.relationship", "r.target")
        .distinct()
    )
    w = Window.partitionBy("query_concept").orderBy("source", "relationship", "target")
    return (
        rel.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= cap)
    )
