"""Relation extraction: proximity pairs, pattern matches, treats-edges.

Reference: backend/app/services/relation_extraction.py —
* proximity relations (:301-370): a self range-join of mentions within a
  turn (|Δstart| ≤ 200 chars), domain-pair rules with a
  keyword-in-between check (confidence 0.8) or close proximity < 50
  (confidence 0.5);
* pattern relations (:96-186, 256-299): regex templates with two capture
  groups → (source_text, target_text, relation_type), confidence 0.7;
* relation dedup (:472-490): argmax confidence per
  (source_text, target_text, relation_type);
* condition_treated_by / drug_treats KG edges
  (schemas/knowledge_graph.py:29-30).

These operators are NOT in the reference's job path (SURVEY §3.1), so
they don't affect triple parity; they're implemented for operator
coverage.  Spark-first notes:

* the mention self-join is an equi join on the turn key
  ``(conv_id, turn_idx)`` followed by the range predicate — a turn's
  mentions co-locate, so this never becomes a cross-partition range
  join;
* the between-text keyword check is a native ``substring`` + predicate
  on the (broadcastable) turn text — no Python;
* one reference quirk is intentionally FIXED here: the reference
  compares capitalized vocabulary domains ("Condition") against
  lowercase enum values ("condition") at :335-337, so its proximity
  rules can never fire on dictionary mentions; we compare
  case-insensitively (documented deviation — functional, not parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MAX_ENTITY_DISTANCE = 200  # chars (:330-332)
CLOSE_DISTANCE = 50        # (:347)

# (source_domain, target_domain, relation_type, keywords) (:310-321)
DOMAIN_RULES = [
    ("drug", "condition", "treats", ["for", "treat", "treating", "therapy"]),
    ("condition", "drug", "treats", ["on", "taking", "continue", "start"]),
    ("observation", "condition", "indicates", ["suggestive", "concerning", "indicates", "shows"]),
    ("measurement", "condition", "diagnoses", ["confirms", "shows", "reveals", "positive"]),
    ("procedure", "condition", "performed_for", ["for", "to treat", "performed"]),
]

# (pattern, source_domain, target_domain, relation_type) — the FULL
# ALL_PATTERNS set (relation_extraction.py:96-186), regex bodies verbatim
# with an inline (?i) (the reference passes re.IGNORECASE); the
# ``allergic to`` pattern has one capture group and a None source domain
# (reference :268-271: source_text = "").  All constructs are common to
# Java (Spark) and RE2 (DuckDB oracle).
PATTERN_RULES: list[tuple[str, str | None, str, str]] = [
    # TREATMENT_PATTERNS (:96-128)
    (r"(?i)(\b\w+(?:\s+\w+)?\b)\s+(?:for|to\s+treat|for\s+treatment\s+of)\s+(\b\w+(?:\s+\w+)*\b)",
     "drug", "condition", "treats"),
    (r"(?i)started\s+(?:on\s+)?(\b\w+(?:\s+\w+)?\b)\s+for\s+(\b\w+(?:\s+\w+)*\b)",
     "drug", "condition", "prescribed_for"),
    (r"(?i)continue\s+(\b\w+(?:\s+\w+)?\b)\s+for\s+(\b\w+(?:\s+\w+)*\b)",
     "drug", "condition", "treats"),
    (r"(?i)(\b\w+(?:\s+\w+)*\b)\s*[-–:]\s*(?:start|continue|on)\s+(\b\w+(?:\s+\w+)?\b)",
     "condition", "drug", "treats"),
    (r"(?i)(?:patient\s+)?on\s+(\b\w+(?:\s+\w+)?\b)\s+for\s+(?:his|her|their\s+)?(\b\w+(?:\s+\w+)*\b)",
     "drug", "condition", "treats"),
    (r"(?i)(\b\w+(?:\s+\w+)*\b),?\s+(?:treated|managed)\s+(?:with|on)\s+(\b\w+(?:\s+\w+)?\b)",
     "condition", "drug", "treats"),
    (r"(?i)(\b\w+(?:\s+\w+)*\b),?\s+(?:controlled|stable)\s+(?:on|with)\s+(\b\w+(?:\s+\w+)?\b)",
     "condition", "drug", "treats"),
    (r"(?i)(\b\w+(?:\s+\w+)*\b),?\s+on\s+(\b\w+(?:\s+\w+)?\b)",
     "condition", "drug", "treats"),
    # ADVERSE_PATTERNS (:130-143)
    (r"(?i)(\b\w+(?:\s+\w+)?\b)\s+(?:caused?|causing|leads?\s+to|resulted?\s+in)\s+(\b\w+(?:\s+\w+)*\b)",
     "drug", "condition", "causes"),
    (r"(?i)(\b\w+(?:\s+\w+)*\b)\s+(?:from|due\s+to|secondary\s+to)\s+(\b\w+(?:\s+\w+)?\b)",
     "condition", "drug", "caused_by"),
    (r"(?i)allergic\s+(?:to|reaction\s+to)\s+(\b\w+(?:\s+\w+)?\b)",
     None, "drug", "contraindicated_for"),
    # DIAGNOSTIC_PATTERNS (:145-158)
    (r"(?i)(\b\w+(?:\s+\w+)?\b)\s+(?:shows?|revealed?|demonstrates?|confirms?)\s+(\b\w+(?:\s+\w+)*\b)",
     "measurement", "condition", "diagnoses"),
    (r"(?i)(\b\w+(?:\s+\w+)*\b)\s+(?:diagnosed\s+(?:by|with|on)|confirmed\s+(?:by|on))\s+(\b\w+(?:\s+\w+)?\b)",
     "condition", "measurement", "diagnoses"),
    (r"(?i)(\b\w+(?:\s+\w+)*\b)\s+(?:suggestive\s+of|consistent\s+with|indicative\s+of|concerning\s+for)\s+(\b\w+(?:\s+\w+)*\b)",
     "observation", "condition", "indicates"),
    # PROCEDURE_PATTERNS (:160-168)
    (r"(?i)(\b\w+(?:\s+\w+)*\b)\s+(?:for|to\s+treat|performed\s+for)\s+(\b\w+(?:\s+\w+)*\b)",
     "procedure", "condition", "performed_for"),
    (r"(?i)(\b\w+(?:\s+\w+)*\b)\s*[-–:]\s*(?:schedule|perform|undergo)\s+(\b\w+(?:\s+\w+)*\b)",
     "condition", "procedure", "requires"),
    # ANATOMICAL_PATTERNS (:170-178)
    (r"(?i)(\b\w+(?:\s+\w+)*\b)\s+(?:in|of|involving)\s+(?:the\s+)?(\b\w+(?:\s+\w+)*\b)",
     "condition", "spec_anatomic_site", "located_in"),
    (r"(?i)(\b\w+)\s+(pain|mass|lesion|tumor|infection|inflammation|swelling)",
     "spec_anatomic_site", "condition", "affects"),
]


def proximity_relations(mentions: DataFrame, transcripts: DataFrame) -> DataFrame:
    """Per-turn mention-pair relations via domain rules + between-text keywords."""
    m = mentions.select(
        "conv_id", "turn_idx", "mention_text", "start_offset", "end_offset",
        F.lower(F.coalesce(F.col("domain_hint"), F.lit("observation"))).alias("dom"),
    )
    a = m.alias("a")
    b = m.alias("b")
    pairs = (
        a.join(b, ["conv_id", "turn_idx"])
        .filter(
            ((F.col("a.start_offset") != F.col("b.start_offset"))
             | (F.col("a.end_offset") != F.col("b.end_offset")))
            & (F.abs(F.col("a.start_offset") - F.col("b.start_offset")) <= MAX_ENTITY_DISTANCE)
        )
        .join(transcripts.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"])
    )
    between = F.lower(
        F.expr(
            "substring(text, least(a.end_offset, b.end_offset) + 1,"
            " greatest(a.start_offset, b.start_offset) - least(a.end_offset, b.end_offset))"
        )
    )
    pairs = pairs.withColumn("between_text", between).withColumn(
        "distance", F.abs(F.col("a.start_offset") - F.col("b.start_offset"))
    )

    # ONE pass: join the pair stream against a broadcast rules dimension
    # instead of one filtered union branch per rule — a 5-branch union
    # re-evaluates the (mentions ⋈ mentions ⋈ transcripts) subtree per
    # rule (plan audit r02: 5× the python/exchange stages).  Identical
    # result multiset: a pair matching k rules yields k rows either way.
    spark = mentions.sparkSession
    rules_dim = F.broadcast(spark.createDataFrame(
        [(s, t, r, list(k)) for s, t, r, k in DOMAIN_RULES],
        "src_dom string, tgt_dom string, relation_type string, keywords array<string>",
    ))
    joined = pairs.join(
        rules_dim,
        (F.col("a.dom") == F.col("src_dom")) & (F.col("b.dom") == F.col("tgt_dom")),
    )
    has_kw = F.exists("keywords", lambda k: F.col("between_text").contains(k))
    return (
        joined.filter(has_kw | (F.col("distance") < CLOSE_DISTANCE))
        .select(
            "conv_id", "turn_idx",
            F.col("a.mention_text").alias("source_text"),
            F.col("a.dom").alias("source_domain"),
            F.col("b.mention_text").alias("target_text"),
            F.col("b.dom").alias("target_domain"),
            "relation_type",
            F.when(has_kw, 0.8).otherwise(0.5).alias("confidence"),
            F.lit("proximity").alias("method"),
        )
    )


def pattern_relations(transcripts: DataFrame) -> DataFrame:
    """Regex-template relations (confidence 0.7).

    Two-group patterns emit (source, target); the single-group
    ``allergic to`` pattern emits source_text='' per the reference
    (relation_extraction.py:264-271)."""
    t = transcripts.select("conv_id", "turn_idx", "text")
    parts = []
    for pattern, src_dom, tgt_dom, rel_type in PATTERN_RULES:
        single = src_dom is None
        if single:
            src_col = F.lit("")
            tgt = F.regexp_extract_all(F.col("text"), F.lit(pattern), 1)
            zipped = F.arrays_zip(tgt.alias("o"))
        else:
            g1 = F.regexp_extract_all(F.col("text"), F.lit(pattern), 1)
            g2 = F.regexp_extract_all(F.col("text"), F.lit(pattern), 2)
            zipped = F.arrays_zip(g1.alias("s"), g2.alias("o"))
            src_col = F.trim(F.col("m.s"))
        e = (
            t.select("conv_id", "turn_idx", F.explode(zipped).alias("m"))
            .select(
                "conv_id", "turn_idx",
                src_col.alias("source_text"),
                F.lit(src_dom).cast("string").alias("source_domain"),
                F.trim(F.col("m.o")).alias("target_text"),
                F.lit(tgt_dom).alias("target_domain"),
                F.lit(rel_type).alias("relation_type"),
                F.lit(0.7).alias("confidence"),
                F.lit("pattern").alias("method"),
            )
            .filter(F.length("target_text") >= 2)  # (:275-277)
        )
        parts.append(e)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def dedup_relations(relations: DataFrame) -> DataFrame:
    """Keep max-confidence row per (source_text, target_text, relation_type)
    within a conversation (relation_extraction.py:472-490)."""
    return (
        relations.groupBy("conv_id", "source_text", "target_text", "relation_type")
        .agg(
            F.max("confidence").alias("confidence"),
            F.min("turn_idx").alias("first_turn_idx"),
            F.expr("min_by(method, turn_idx)").alias("method"),
            F.expr("min_by(source_domain, turn_idx)").alias("source_domain"),
            F.expr("min_by(target_domain, turn_idx)").alias("target_domain"),
        )
    )


def treats_edges(relations: DataFrame, top_candidates: DataFrame) -> DataFrame:
    """condition_treated_by / drug_treats graph edges from 'treats' relations.

    Source/target mention texts link to concepts through the candidate
    table (broadcast — candidate texts are dictionary-bounded), then the
    edge pair is emitted in both directions as the reference does
    (schemas/knowledge_graph.py:29-30).
    """
    texts = (
        top_candidates.select(
            "conv_id",
            F.lower(F.col("mention_text")).alias("txt"),
            "omop_concept_id", "domain_id",
        )
        # deterministic 1-row-per-(conv, text): min concept id + its domain
        # (dropDuplicates keeps an arbitrary row — not reproducible)
        .groupBy("conv_id", "txt")
        .agg(
            F.min("omop_concept_id").alias("omop_concept_id"),
            F.expr("min_by(domain_id, omop_concept_id)").alias("domain_id"),
        )
    )
    treats = relations.filter(F.col("relation_type") == "treats")
    src = texts.select("conv_id", F.col("txt").alias("src_txt"),
                       F.col("omop_concept_id").alias("src_concept"),
                       F.col("domain_id").alias("src_dom"))
    dst = texts.select("conv_id", F.col("txt").alias("dst_txt"),
                       F.col("omop_concept_id").alias("dst_concept"),
                       F.col("domain_id").alias("dst_dom"))
    t = treats.withColumn("src_txt", F.lower("source_text")).withColumn("dst_txt", F.lower("target_text"))
    linked = t.join(src, ["conv_id", "src_txt"]).join(dst, ["conv_id", "dst_txt"])
    # ONE pass over `linked`: conditional swap normalizes the pair to
    # (drug, condition), then an explode emits both edge directions — a
    # filter-per-direction + union-per-edge-type formulation evaluates
    # the (relations ⋈ candidates ⋈ candidates) subtree 4× (plan audit r02)
    oriented = linked.filter(
        ((F.col("src_dom") == "drug") & (F.col("dst_dom") == "condition"))
        | ((F.col("src_dom") == "condition") & (F.col("dst_dom") == "drug"))
    ).select(
        "conv_id", "confidence",
        F.when(F.col("src_dom") == "drug", F.col("src_concept"))
        .otherwise(F.col("dst_concept")).alias("drug_id"),
        F.when(F.col("src_dom") == "drug", F.col("dst_concept"))
        .otherwise(F.col("src_concept")).alias("cond_id"),
    )
    both_dirs = oriented.select(
        "conv_id", "confidence",
        F.explode(F.array(
            F.struct(F.col("drug_id").alias("source_concept_id"),
                     F.col("cond_id").alias("target_concept_id"),
                     F.lit("drug_treats").alias("edge_type")),
            F.struct(F.col("cond_id").alias("source_concept_id"),
                     F.col("drug_id").alias("target_concept_id"),
                     F.lit("condition_treated_by").alias("edge_type")),
        )).alias("e"),
    )
    return (
        both_dirs.select("conv_id", "e.source_concept_id", "e.target_concept_id",
                         "e.edge_type", "confidence")
        # deterministic dedup: keep max confidence per edge
        .groupBy("conv_id", "source_concept_id", "target_concept_id", "edge_type")
        .agg(F.max("confidence").alias("confidence"))
    )
