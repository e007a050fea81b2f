"""CPT/HCPCS code suggestion over the merged 5,046-code dimension.

Port of ``backend/app/services/cpt_suggester.py``:

* core table + 3.8 MB expanded fixture merged per
  ``load_extended_cpt_codes`` (:872-947) — the synonym index carries
  per-code synonyms PLUS the first 3 meaningful description words
  (len > 4, stopword-filtered) — extracted verbatim to
  ``data/cpt_codes.json`` / ``data/cpt_synonyms.json`` (35,350 synonym
  rows);
* three-tier matching (:991-1060): exact synonym, substring partial
  synonym, description word-overlap ≥ 2 minus stopwords;
* confidence quirk preserved (:1121-1126): ``exact_synonym`` reaches
  HIGH only when >2 clinical-context evidence items exist — with no
  context (this batch path passes none) exact and partial are both
  MEDIUM, description LOW.

Spark-first: at 35k rows the synonym dim is comfortably broadcastable;
tier 2's substring theta join and tier 3's token-overlap scan run
against the broadcast, so the only shuffles are the per-query dedup and
rank windows.  Determinism deviations as in kgnorm.icd10 (rank by code,
min-synonym reporting).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kgnorm.ontology import DATA_DIR

# cpt_suggester.py:1047
_DESC_STOPWORDS = ["of", "the", "and", "or", "a", "an", "with", "without", "for", "to"]


def load_cpt(data_dir: str | None = None) -> tuple[list[dict], list[dict]]:
    d = data_dir or DATA_DIR
    with open(os.path.join(d, "cpt_codes.json")) as f:
        codes = json.load(f)["codes"]
    with open(os.path.join(d, "cpt_synonyms.json")) as f:
        synonyms = json.load(f)["synonyms"]
    return codes, synonyms


def codes_dim(spark: SparkSession, data_dir: str | None = None) -> DataFrame:
    codes, _s = load_cpt(data_dir)
    rows = [(c["code"], c["description"], c["category"]) for c in codes]
    return spark.createDataFrame(rows, "code string, description string, category string")


def synonyms_dim(spark: SparkSession, data_dir: str | None = None) -> DataFrame:
    _c, synonyms = load_cpt(data_dir)
    rows = [(s["synonym"], s["code"]) for s in synonyms]
    return spark.createDataFrame(rows, "synonym string, code string")


def suggest_codes(
    queries: DataFrame,
    codes: DataFrame,
    synonyms: DataFrame,
    max_suggestions: int = 10,
) -> DataFrame:
    """Queries (column ``query``) → ranked CPT suggestions.

    Output: (query, code, description, category, confidence,
    match_type, matched, rank)."""
    q = queries.select("query", F.lower(F.trim(F.col("query"))).alias("q"))
    syn = F.broadcast(synonyms)
    dim = F.broadcast(codes)

    t1 = q.join(syn, q.q == syn.synonym).select(
        "query", "code", F.lit(1).alias("tier"),
        F.lit("exact_synonym").alias("match_type"),
        F.col("synonym").alias("matched"),
    )
    t2 = (
        q.join(syn, F.col("q").contains(F.col("synonym")) | F.col("synonym").contains(F.col("q")))
        .groupBy("query", "code")
        .agg(F.min("synonym").alias("matched"))
        .select("query", "code", F.lit(2).alias("tier"),
                F.lit("partial_synonym").alias("match_type"), "matched")
    )
    stop = F.array(*[F.lit(w) for w in _DESC_STOPWORDS])
    q_words = F.array_except(F.array_distinct(F.split(F.col("q"), " ")), stop)
    d_words = F.array_except(F.array_distinct(F.split(F.lower(F.col("description")), " ")), stop)
    common = F.array_intersect(q_words, d_words)
    t3 = (
        q.join(dim)
        .withColumn("common", common)
        .filter(F.size("common") >= 2)
        .select("query", "code", F.lit(3).alias("tier"),
                F.lit("description").alias("match_type"),
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
    # no clinical context in the batch path → exact_synonym stays MEDIUM
    # (cpt_suggester.py:1121-1126 requires >2 evidence items for HIGH)
    conf = F.when(F.col("tier").isin(1, 2), "medium").otherwise("low")
    return ranked.join(dim, "code").select(
        "query", "code", "description", "category",
        conf.alias("confidence"), "match_type", "matched", "rank",
    )
