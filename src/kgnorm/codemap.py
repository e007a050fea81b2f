"""ETL code-mapping joins: source vocabulary codes → OMOP standard concepts.

Port of ``backend/app/services/vocabulary_mapping.py``:

* mapping paths (ICD10CM/…→SNOMED, NDC→RxNorm, LOINC→LOINC, :75-86);
* local-mapping override checked FIRST (type ``local``, confidence
  medium/0.7, :264-279);
* source-concept lookup on (code, vocabulary) (:281-302, :438-450);
* "Maps to" preferred over any other relationship; relationship-typed
  confidence (Maps to → high/0.95, Is a|Subsumes → medium/0.75, else
  low/0.5, :326-341);
* unmapped reasons (:303-309, :315-323) and the batch mapping-rate
  rollup (:364-396).

Spark-first: every lookup is a broadcast join against ontology-bounded
dimension tables; best-mapping selection is a rank window per source
code.  One documented deviation: the reference takes "the first" row of
the relationship list when no "Maps to" exists (:345-347) — DB order,
nondeterministic; here the tie-break is (relationship_id, target id),
the same deterministic stand-in the linking cascade uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# vocabulary_mapping.py:75-86
VOCABULARY_MAPPING_PATHS = {
    "ICD10CM": "SNOMED",
    "ICD10PCS": "SNOMED",
    "ICD9CM": "SNOMED",
    "ICD9Proc": "SNOMED",
    "CPT4": "SNOMED",
    "HCPCS": "SNOMED",
    "NDC": "RxNorm",
    "LOINC": "LOINC",
}

_REL_CONF = [  # :333-341
    ("Maps to", "high", 0.95),
    ("Is a", "medium", 0.75),
    ("Subsumes", "medium", 0.75),
]


def _target_vocab_col():
    m = F.create_map(*[F.lit(x) for kv in VOCABULARY_MAPPING_PATHS.items() for x in kv])
    return m[F.col("source_vocabulary")]


def map_codes(
    codes: DataFrame,
    concepts: DataFrame,
    relationships: DataFrame,
    local_mappings: DataFrame | None = None,
) -> DataFrame:
    """Batch code mapping.

    ``codes``: (source_code, source_vocabulary).
    ``concepts``: OMOP concept dimension (concept_id, concept_name,
    concept_code, vocabulary_id).
    ``relationships``: (concept_id_1, concept_id_2, relationship_id).
    ``local_mappings``: optional (local_code, local_vocabulary,
    local_description, omop_concept_id, omop_concept_name).

    Output mirrors MappingResult (vocabulary_mapping.py:93-138).
    """
    c = codes.select(
        "source_code", "source_vocabulary",
        F.upper(F.col("source_code")).alias("_code_u"),
        _target_vocab_col().alias("target_vocabulary"),
    )

    src_dim = F.broadcast(concepts.select(
        F.upper(F.col("concept_code")).alias("_code_u"),
        F.col("vocabulary_id").alias("source_vocabulary"),
        F.col("concept_id").alias("source_concept_id"),
        F.col("concept_name").alias("source_concept_name"),
    ))
    looked = c.join(src_dim, ["_code_u", "source_vocabulary"], "left")

    # best mapping per source concept: Maps to first, then deterministic
    # (relationship_id, target id) order
    rel_pref = F.when(F.col("relationship_id") == "Maps to", 0).otherwise(1)
    w = Window.partitionBy("concept_id_1").orderBy(
        rel_pref, "relationship_id", "concept_id_2"
    )
    best_rel = F.broadcast(
        relationships.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            F.col("concept_id_1").alias("source_concept_id"),
            F.col("concept_id_2").alias("target_concept_id"),
            "relationship_id",
        )
    )
    tgt_dim = F.broadcast(concepts.select(
        F.col("concept_id").alias("target_concept_id"),
        F.col("concept_name").alias("target_concept_name"),
    ))
    mapped = (
        looked.join(best_rel, "source_concept_id", "left")
        .join(tgt_dim, "target_concept_id", "left")
    )

    conf_level = F.lit(None).cast("string")
    conf_score = F.lit(None).cast("double")
    for rel, level, score in reversed(_REL_CONF):
        conf_level = F.when(F.col("relationship_id") == rel, level).otherwise(conf_level)
        conf_score = F.when(F.col("relationship_id") == rel, score).otherwise(conf_score)
    conf_level = F.coalesce(conf_level, F.when(F.col("relationship_id").isNotNull(), "low"))
    conf_score = F.coalesce(conf_score, F.when(F.col("relationship_id").isNotNull(), 0.5))

    result = mapped.select(
        "source_code", "source_vocabulary",
        "source_concept_id", "source_concept_name",
        "target_concept_id", "target_concept_name",
        F.when(F.col("target_concept_id").isNotNull(), F.col("target_vocabulary")).alias("target_vocabulary"),
        F.when(F.col("target_concept_id").isNotNull(), "direct")
        .otherwise("unmapped").alias("mapping_type"),
        F.coalesce(conf_level, F.lit("low")).alias("confidence"),
        F.coalesce(conf_score, F.lit(0.0)).alias("confidence_score"),
        "relationship_id",
        F.when(F.col("source_concept_id").isNull(),
               F.concat(F.lit("Source code not found in "), F.col("source_vocabulary")))
        .when(F.col("target_concept_id").isNull(), F.lit("No 'Maps to' relationship found"))
        .alias("unmapped_reason"),
    )

    if local_mappings is not None:
        loc = F.broadcast(local_mappings.select(
            F.upper(F.col("local_code")).alias("_code_u"),
            F.col("local_vocabulary").alias("source_vocabulary"),
            F.col("local_description").alias("_local_desc"),
            F.col("omop_concept_id").alias("_local_target"),
            F.col("omop_concept_name").alias("_local_target_name"),
        ))
        with_local = c.join(loc, ["_code_u", "source_vocabulary"], "left")
        local_hit = with_local.filter(F.col("_local_target").isNotNull()).select(
            "source_code", "source_vocabulary",
            F.lit(None).cast("long").alias("source_concept_id"),
            F.col("_local_desc").alias("source_concept_name"),
            F.col("_local_target").alias("target_concept_id"),
            F.col("_local_target_name").alias("target_concept_name"),
            "target_vocabulary",
            F.lit("local").alias("mapping_type"),
            F.lit("medium").alias("confidence"),
            F.lit(0.7).alias("confidence_score"),
            F.lit(None).cast("string").alias("relationship_id"),
            F.lit(None).cast("string").alias("unmapped_reason"),
        )
        not_local = with_local.filter(F.col("_local_target").isNull()).select(
            "source_code", "source_vocabulary"
        )
        result = local_hit.unionByName(result.join(not_local, ["source_code", "source_vocabulary"], "leftsemi"))

    return result


def mapping_rate(mapped: DataFrame) -> DataFrame:
    """Batch rollup (vocabulary_mapping.py:140-170): totals + rate."""
    return mapped.agg(
        F.count(F.lit(1)).alias("total_codes"),
        F.sum(F.when(F.col("target_concept_id").isNotNull(), 1).otherwise(0)).alias("mapped"),
        F.round(
            F.avg(F.when(F.col("target_concept_id").isNotNull(), 1.0).otherwise(0.0)), 6
        ).alias("mapping_rate"),
    )
