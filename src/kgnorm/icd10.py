"""ICD-10 code suggestion: clinical text → ranked code candidates.

Port of ``backend/app/services/icd10_suggester.py``:

* 73-code core table with synonyms (:123-662), extracted verbatim to
  ``data/icd10_codes.json`` (the reference's extended-fixture path
  ``icd10_codes_full.json`` does not exist in its tree, so the service
  effectively runs core-only — quirk preserved);
* three-tier matching (:830-891): exact synonym (high), substring
  partial synonym (medium), description word-overlap ≥ 2 meaningful
  words — or 1 when the query itself has ≤ 2 words — minus stopwords
  (low); first tier to claim a code wins;
* confidence-ordered, max-N results.

Spark-first: the code/synonym tables are broadcast dimensions
(bounded); tier 1 is an equi join, tier 2 a contains() theta join
against the broadcast synonym dim, tier 3 an array_intersect over
split descriptions — the same anti-join-free shape as the linking
cascade (a code claimed by a cheaper tier is deduped by a min-tier
window, which beats per-tier anti joins when the dims are broadcast).
Determinism deviations (documented like the linking cascade's): within
a tier, candidates rank by code; a tier-2 match reports the
alphabetically smallest matching synonym (the reference takes dict
iteration order).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kgnorm.ontology import DATA_DIR

# icd10_suggester.py:879-881
_DESC_STOPWORDS = ["of", "the", "and", "or", "a", "an", "with", "without", "unspecified", "other"]


def load_icd10(data_dir: str | None = None) -> list[dict]:
    path = os.path.join(data_dir or DATA_DIR, "icd10_codes.json")
    with open(path) as f:
        return json.load(f)["codes"]


def codes_dim(spark: SparkSession, data_dir: str | None = None) -> DataFrame:
    rows = [
        (r["code"], r["description"], r["category"], bool(r["is_billable"]))
        for r in load_icd10(data_dir)
    ]
    return spark.createDataFrame(
        rows, "code string, description string, category string, is_billable boolean"
    )


def synonyms_dim(spark: SparkSession, data_dir: str | None = None) -> DataFrame:
    """(synonym → code), synonym lowercase (icd10_suggester.py:716-722)."""
    rows = []
    seen = set()
    for r in load_icd10(data_dir):
        for syn in r["synonyms"]:
            k = (syn.lower(), r["code"])
            if k not in seen:
                seen.add(k)
                rows.append(k)
    return spark.createDataFrame(rows, "synonym string, code string")


def suggest_codes(
    queries: DataFrame,
    codes: DataFrame,
    synonyms: DataFrame,
    max_suggestions: int = 10,
) -> DataFrame:
    """Queries (column ``query``) → ranked code suggestions.

    Output: (query, code, description, category, is_billable,
    confidence, matched, rank)."""
    q = queries.select("query", F.lower(F.trim(F.col("query"))).alias("q"))
    syn = F.broadcast(synonyms)
    dim = F.broadcast(codes)

    # tier 1 — exact synonym (:848-857)
    t1 = q.join(syn, q.q == syn.synonym).select(
        "query", "code", F.lit(1).alias("tier"), F.col("synonym").alias("matched")
    )

    # tier 2 — substring either way (:859-868); alphabetically smallest
    # matching synonym reported (determinism deviation)
    t2 = (
        q.join(syn, F.col("q").contains(F.col("synonym")) | F.col("synonym").contains(F.col("q")))
        .groupBy("query", "code")
        .agg(F.min("synonym").alias("matched"))
        .select("query", "code", F.lit(2).alias("tier"), "matched")
    )

    # tier 3 — description word overlap (:870-888)
    stop = F.array(*[F.lit(w) for w in _DESC_STOPWORDS])
    q_words = F.array_except(F.array_distinct(F.split(F.col("q"), " ")), stop)
    n_query_words = F.size(F.array_distinct(F.split(F.col("q"), " ")))
    d_words = F.array_except(F.array_distinct(F.split(F.lower(F.col("description")), " ")), stop)
    common = F.array_intersect(q_words, d_words)
    t3 = (
        q.join(dim)
        .withColumn("common", common)
        .withColumn("nq", n_query_words)
        .filter((F.size("common") >= 2) | ((F.size("common") == 1) & (F.col("nq") <= 2)))
        .select("query", "code", F.lit(3).alias("tier"),
                F.array_join(F.array_sort("common"), ", ").alias("matched"))
    )

    unioned = t1.unionByName(t2).unionByName(t3)
    w_dedup = Window.partitionBy("query", "code").orderBy("tier", "matched")
    w_rank = Window.partitionBy("query").orderBy("tier", "code")
    ranked = (
        unioned.withColumn("_d", F.row_number().over(w_dedup)).filter(F.col("_d") == 1)
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= max_suggestions)
    )
    conf = (
        F.when(F.col("tier") == 1, "high")
        .when(F.col("tier") == 2, "medium")
        .otherwise("low")
    )
    return ranked.join(dim, "code").select(
        "query", "code", "description", "category", "is_billable",
        conf.alias("confidence"), "matched", "rank",
    )
