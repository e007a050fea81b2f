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

# (pattern, source_domain, target_domain, relation_type) — a representative
# subset of ALL_PATTERNS (:96-186) expressed in Java/RE2-common syntax
PATTERN_RULES = [
    (r"(?i)started\s+(?:on\s+)?(\w+(?:\s+\w+)?)\s+for\s+(\w+(?:\s+\w+)*)",
     "drug", "condition", "prescribed_for"),
    (r"(?i)continue\s+(\w+(?:\s+\w+)?)\s+for\s+(\w+(?:\s+\w+)*)",
     "drug", "condition", "treats"),
    (r"(?i)(\w+(?:\s+\w+)*),?\s+(?:treated|managed)\s+(?:with|on)\s+(\w+(?:\s+\w+)?)",
     "condition", "drug", "treats"),
    (r"(?i)(\w+(?:\s+\w+)*),?\s+(?:controlled|stable)\s+(?:on|with)\s+(\w+(?:\s+\w+)?)",
     "condition", "drug", "treats"),
    (r"(?i)(\w+(?:\s+\w+)*)\s+(?:suggestive\s+of|consistent\s+with|indicative\s+of|concerning\s+for)\s+(\w+(?:\s+\w+)*)",
     "observation", "condition", "indicates"),
    (r"(?i)(\w+(?:\s+\w+)?)\s+(?:shows?|revealed?|demonstrates?|confirms?)\s+(\w+(?:\s+\w+)*)",
     "measurement", "condition", "diagnoses"),
    (r"(?i)(\w+)\s+(pain|mass|lesion|tumor|infection|inflammation|swelling)",
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

    out = None
    for src_dom, tgt_dom, rel_type, keywords in DOMAIN_RULES:
        has_kw = None
        for kw in keywords:
            c = F.col("between_text").contains(kw)
            has_kw = c if has_kw is None else (has_kw | c)
        matched = (
            pairs.filter((F.col("a.dom") == src_dom) & (F.col("b.dom") == tgt_dom))
            .filter(has_kw | (F.col("distance") < CLOSE_DISTANCE))
            .select(
                "conv_id", "turn_idx",
                F.col("a.mention_text").alias("source_text"),
                F.col("a.dom").alias("source_domain"),
                F.col("b.mention_text").alias("target_text"),
                F.col("b.dom").alias("target_domain"),
                F.lit(rel_type).alias("relation_type"),
                F.when(has_kw, 0.8).otherwise(0.5).alias("confidence"),
                F.lit("proximity").alias("method"),
            )
        )
        out = matched if out is None else out.unionByName(matched)
    return out


def pattern_relations(transcripts: DataFrame) -> DataFrame:
    """Regex-template relations with two capture groups (confidence 0.7)."""
    t = transcripts.select("conv_id", "turn_idx", "text")
    parts = []
    for pattern, src_dom, tgt_dom, rel_type in PATTERN_RULES:
        g1 = F.regexp_extract_all(F.col("text"), F.lit(pattern), 1)
        g2 = F.regexp_extract_all(F.col("text"), F.lit(pattern), 2)
        e = (
            t.select("conv_id", "turn_idx", F.explode(F.arrays_zip(g1.alias("s"), g2.alias("o"))).alias("m"))
            .select(
                "conv_id", "turn_idx",
                F.trim(F.col("m.s")).alias("source_text"),
                F.lit(src_dom).alias("source_domain"),
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
        .dropDuplicates(["conv_id", "txt"])
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
    drug_first = linked.filter((F.col("src_dom") == "drug") & (F.col("dst_dom") == "condition"))
    cond_first = linked.filter((F.col("src_dom") == "condition") & (F.col("dst_dom") == "drug"))
    drug_treats = drug_first.select(
        "conv_id", F.col("src_concept").alias("source_concept_id"),
        F.col("dst_concept").alias("target_concept_id"),
        F.lit("drug_treats").alias("edge_type"), "confidence",
    ).unionByName(cond_first.select(
        "conv_id", F.col("dst_concept").alias("source_concept_id"),
        F.col("src_concept").alias("target_concept_id"),
        F.lit("drug_treats").alias("edge_type"), "confidence",
    ))
    treated_by = drug_treats.select(
        "conv_id",
        F.col("target_concept_id").alias("source_concept_id"),
        F.col("source_concept_id").alias("target_concept_id"),
        F.lit("condition_treated_by").alias("edge_type"), "confidence",
    )
    return drug_treats.unionByName(treated_by).dropDuplicates(
        ["conv_id", "source_concept_id", "target_concept_id", "edge_type"]
    )
