"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship KG-construction pipeline;
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL.

Oracle strategy for the KG pipeline: the pipeline's input is a
transcripts table derived DETERMINISTICALLY from the sandbox
``documents`` table (turn text = golden note template ``doc_id % 10``,
conv_id = ``doc_id // 5``).  Because the input is template-periodic, the
expected extraction per template is a fixed 10-row-group relation that
the oracle embeds as a VALUES literal (computed by the same pure-Python
rule engine the Arrow UDF runs — semantics pinned by tests/test_rules.py
against the reference).  Downstream stages (linking, noisy-OR fact
aggregation, triple projection, canonicalization) are then re-derived in
PURE SQL from those VALUES — an independent re-implementation of every
distributed aggregation/join/window, so the comparison catches
distribution bugs (lost rows, wrong dedup keys, nondeterministic
merges), not just plumbing.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

REPO = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(REPO, "src")
if SRC not in sys.path:
    sys.path.insert(0, SRC)

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kgnorm import export, facts as facts_mod, graph, link, metrics, ontology, rules, synth
from kgnorm.ac import build_automaton
from kgnorm.extract import extract_mentions_df

TURNS_PER_CONV = 5
_EDGE_CASE_SQL = (
    "CASE domain WHEN 'condition' THEN 'has_condition' WHEN 'drug' THEN 'takes_drug' "
    "WHEN 'measurement' THEN 'has_measurement' WHEN 'procedure' THEN 'has_procedure' "
    "WHEN 'observation' THEN 'has_observation' WHEN 'device' THEN 'has_observation' "
    "ELSE 'has_observation' END"
)

# ---------------------------------------------------------------------------
# shared lazily-built artifacts
# ---------------------------------------------------------------------------

_ONT = None


def _ont():
    global _ONT
    if _ONT is None:
        _ONT = ontology.load_fixture_ontology()
    return _ONT


_STAGE_CACHE: dict = {}


def _stages(spark: SparkSession, sf_dir: str) -> dict:
    """Derived transcripts + pipeline stage DataFrames, cached per (session, sf)."""
    key = (id(spark), sf_dir)
    if key in _STAGE_CACHE:
        return _STAGE_CACHE[key]
    ont = _ont()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    transcripts = synth.transcripts_from_documents(docs, TURNS_PER_CONV)
    dictionary = ontology.broadcast_dictionary(spark, ont)
    mentions = extract_mentions_df(transcripts, dictionary).persist()
    concepts = ontology.concepts_df(spark, ont)
    synonyms = ontology.synonyms_df(spark, ont)
    candidates = link.link_mentions(mentions, concepts, synonyms).persist()
    top = link.top_candidates(candidates)
    facts = facts_mod.build_facts(facts_mod.mention_facts_input(mentions, top)).persist()
    out = {
        "transcripts": transcripts,
        "mentions": mentions,
        "candidates": candidates,
        "top": top,
        "facts": facts,
    }
    _STAGE_CACHE[key] = out
    return out


# ---------------------------------------------------------------------------
# oracle-side literal generation
# ---------------------------------------------------------------------------


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        # CAST from string parses IEEE-exact; a bare literal would go
        # through DECIMAL and can lose the last ulp
        return f"CAST('{v!r}' AS DOUBLE)"
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def _values(rows: list[tuple]) -> str:
    return ",\n    ".join("(" + ", ".join(_lit(v) for v in r) + ")" for r in rows)


_EXPECTED_MENTIONS = None


def _expected_mentions() -> list[tuple]:
    """Run the pure-Python rule engine over the 10 templates once."""
    global _EXPECTED_MENTIONS
    if _EXPECTED_MENTIONS is None:
        auto = build_automaton(_ont().dictionary)
        rows = []
        for tmpl, text in enumerate(synth.note_templates()):
            for m in rules.extract_mentions(text, auto):
                rows.append((
                    tmpl, m.text, m.start_offset, m.end_offset, m.lexical_variant,
                    m.section, m.assertion, m.temporality, m.experiencer,
                    float(m.confidence), m.domain_hint, int(m.omop_concept_id or 0),
                ))
        _EXPECTED_MENTIONS = rows
    return _EXPECTED_MENTIONS


def _turns_cte() -> str:
    return f"""turns AS (
  SELECT 'C' || lpad(cast(doc_id // {TURNS_PER_CONV} AS varchar), 8, '0') AS conv_id,
         cast(doc_id % {TURNS_PER_CONV} AS int) AS turn_idx,
         cast(doc_id % 10 AS int) AS tmpl
  FROM documents
)"""


def _exp_cte() -> str:
    cols = ("tmpl, mention_text, start_offset, end_offset, lexical_variant, section,"
            " assertion, temporality, experiencer, confidence, domain_hint, omop_concept_id")
    return f"exp({cols}) AS (\n  VALUES {_values(_expected_mentions())}\n)"


def _fi_cte() -> str:
    """FactInput rows: expected mentions joined onto turns (SQL side)."""
    return f"""fi AS (
  SELECT t.conv_id, t.turn_idx, e.mention_text, e.start_offset, e.end_offset,
         e.assertion, e.temporality, e.experiencer,
         cast(e.confidence AS double) AS confidence,
         cast(e.omop_concept_id AS bigint) AS omop_concept_id,
         coalesce(lower(e.domain_hint), 'observation') AS domain,
         t.turn_idx * 100000000 + e.start_offset * 10000 + e.end_offset AS ord
  FROM turns t JOIN exp e USING (tmpl)
)"""


def _facts_cte() -> str:
    return """facts AS (
  SELECT conv_id, omop_concept_id, assertion, temporality, experiencer,
         arg_min(mention_text, ord) AS concept_name,
         arg_min(domain, ord) AS domain,
         round(1 - exp(sum(ln(greatest(1 - confidence, 1e-15)))), 6) AS confidence6,
         count(*) AS evidence_count,
         min(turn_idx) AS first_turn_idx,
         arg_min(start_offset, ord) AS first_start_offset
  FROM fi
  GROUP BY 1, 2, 3, 4, 5
)"""


# ---------------------------------------------------------------------------
# Spark-side query callables
# ---------------------------------------------------------------------------


def _q_kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _stages(spark, sf_dir)["mentions"].select(
        "conv_id", "turn_idx", "mention_text", "start_offset", "end_offset",
        "lexical_variant", "section", "assertion", "temporality", "experiencer",
        "confidence", "domain_hint", "omop_concept_id",
    )


def _q_kg_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _stages(spark, sf_dir)["candidates"].select(
        "conv_id", "turn_idx", "start_offset", "end_offset", "mention_text",
        "omop_concept_id", "concept_name", "concept_code", "vocabulary_id",
        "domain_id", "score", "method", "rank",
    )


def _q_kg_facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _stages(spark, sf_dir)["facts"].select(
        "conv_id", "omop_concept_id", "assertion", "temporality", "experiencer",
        "concept_name", "domain",
        F.round("confidence", 6).alias("confidence6"),
        "evidence_count", "first_turn_idx", "first_start_offset",
    )


def _q_kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.build_triples(_stages(spark, sf_dir)["facts"]).select(
        "conv_id", "subj", "pred", "obj", "omop_concept_id", "assertion"
    )


def _q_kg_domain_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return metrics.domain_counts(_stages(spark, sf_dir)["facts"])


def _q_kg_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = graph.build_nodes(_stages(spark, sf_dir)["facts"])
    return nodes.select(
        "node_id", "conv_id", "node_type", "omop_concept_id", "label",
        F.col("properties")["assertion"].alias("p_assertion"),
        F.col("properties")["is_negated"].alias("p_is_negated"),
    )


def _q_omop_note_nlp(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _stages(spark, sf_dir)
    return export.note_nlp_export(s["mentions"], s["top"]).select(
        "note_nlp_id", "note_id", "conv_id", "turn_idx", "offset_start", "offset_end",
        "lexical_variant", "note_nlp_concept_id", "term_exists", "term_temporal",
    )


_CASCADE_TERMS = [
    "metformin",            # tier 1: exact concept name
    "chf",                  # tier 2: synonym
    "heart failure",        # tier 2: synonym (multi-word)
    "essential hyper",      # tier 3: prefix, fractional score
    "type 2 diabetes",      # tier 3 prefix + tier 4 keyword
    "cancer of colon",      # tier 4: keyword 'cancer' + jaccard 2/3
    "pleuritic pain extra", # tier 4: keyword 'pleuritic' + jaccard 1/2
    "chest",                # tier 3: prefix of two concepts → rank by id
    "zz",                   # no match (below prefix min length)
    "aspirin",              # tier 1
]


def _q_link_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    ont = _ont()
    terms = spark.createDataFrame([(t,) for t in _CASCADE_TERMS], ["term"])
    return link.map_terms(terms, ontology.concepts_df(spark, ont), ontology.synonyms_df(spark, ont)).select(
        "term", F.col("concept_id").cast("long").alias("concept_id"), "concept_name",
        "vocabulary_id", "domain_id", "score", "method", "rank",
    )


def _q_kg_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kgnorm import canon

    rels = ontology.relationships_df(spark, _ont())
    return canon.canonical_mapping(rels).select("concept_id", "canonical_concept_id")


def _q_rank_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic top-k-per-group window (SURVEY §2.6/2.7) on TPC-H orders."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


# ---------------------------------------------------------------------------
# oracle SQL builders
# ---------------------------------------------------------------------------


def _oracle_kg_mentions() -> str:
    return f"""WITH {_turns_cte()}, {_exp_cte()}
SELECT t.conv_id, t.turn_idx, e.mention_text, e.start_offset, e.end_offset,
       e.lexical_variant, e.section, e.assertion, e.temporality, e.experiencer,
       cast(e.confidence AS double) AS confidence, e.domain_hint,
       cast(e.omop_concept_id AS bigint) AS omop_concept_id
FROM turns t JOIN exp e USING (tmpl)"""


def _oracle_kg_candidates() -> str:
    # template mentions are all dictionary-linked (concept_id > 0) → all direct
    return f"""WITH {_turns_cte()}, {_exp_cte()}
SELECT t.conv_id, t.turn_idx, e.start_offset, e.end_offset, e.mention_text,
       cast(e.omop_concept_id AS bigint) AS omop_concept_id,
       e.mention_text AS concept_name,
       cast(e.omop_concept_id AS varchar) AS concept_code,
       'Direct' AS vocabulary_id,
       coalesce(lower(e.domain_hint), 'observation') AS domain_id,
       cast(1.0 AS double) AS score, 'direct' AS method, 1 AS rank
FROM turns t JOIN exp e USING (tmpl)
WHERE e.omop_concept_id > 0"""


def _oracle_kg_facts() -> str:
    return f"""WITH {_turns_cte()}, {_exp_cte()}, {_fi_cte()}, {_facts_cte()}
SELECT conv_id, omop_concept_id, assertion, temporality, experiencer,
       concept_name, domain, confidence6, evidence_count,
       first_turn_idx, first_start_offset
FROM facts"""


def _oracle_kg_triples() -> str:
    return f"""WITH {_turns_cte()}, {_exp_cte()}, {_fi_cte()}, {_facts_cte()},
typed AS (SELECT *, {_EDGE_CASE_SQL} AS pred FROM facts),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, pred, omop_concept_id
    ORDER BY first_turn_idx, first_start_offset, assertion) AS rn
  FROM typed)
SELECT conv_id, conv_id AS subj, pred,
       'concept:' || cast(omop_concept_id AS varchar) AS obj,
       omop_concept_id, assertion
FROM ranked WHERE rn = 1"""


def _oracle_kg_domain_counts() -> str:
    return f"""WITH {_turns_cte()}, {_exp_cte()}, {_fi_cte()}, {_facts_cte()}
SELECT conv_id, domain, count(*) AS n_facts FROM facts GROUP BY 1, 2"""


def _oracle_kg_nodes() -> str:
    node_type_sql = (
        "CASE domain WHEN 'condition' THEN 'condition' WHEN 'drug' THEN 'drug' "
        "WHEN 'measurement' THEN 'measurement' WHEN 'procedure' THEN 'procedure' "
        "WHEN 'observation' THEN 'observation' WHEN 'device' THEN 'observation' "
        "ELSE 'observation' END"
    )
    return f"""WITH {_turns_cte()}, {_exp_cte()}, {_fi_cte()}, {_facts_cte()},
typed AS (SELECT *, {node_type_sql} AS node_type FROM facts),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, node_type, omop_concept_id
    ORDER BY first_turn_idx, first_start_offset, assertion) AS rn
  FROM typed),
concept_nodes AS (
  SELECT sha256('concept|' || conv_id || '|' || node_type || '|' || cast(omop_concept_id AS varchar)) AS node_id,
         conv_id, node_type, cast(omop_concept_id AS bigint) AS omop_concept_id,
         concept_name AS label,
         assertion AS p_assertion,
         cast(assertion = 'absent' AS varchar) AS p_is_negated
  FROM ranked WHERE rn = 1),
hubs AS (
  SELECT DISTINCT sha256('patient|' || conv_id) AS node_id, conv_id,
         'patient' AS node_type, cast(NULL AS bigint) AS omop_concept_id,
         conv_id AS label, cast(NULL AS varchar) AS p_assertion,
         cast(NULL AS varchar) AS p_is_negated
  FROM facts)
SELECT node_id, conv_id, node_type, omop_concept_id, label, p_assertion, p_is_negated
FROM concept_nodes
UNION ALL
SELECT node_id, conv_id, node_type, omop_concept_id, label, p_assertion, p_is_negated FROM hubs"""


def _oracle_omop_note_nlp() -> str:
    return f"""WITH {_turns_cte()}, {_exp_cte()}
SELECT md5(t.conv_id || '|' || cast(t.turn_idx AS varchar) || '|' ||
           cast(e.start_offset AS varchar) || '|' || cast(e.end_offset AS varchar)) AS note_nlp_id,
       md5(t.conv_id || '|' || cast(t.turn_idx AS varchar)) AS note_id,
       t.conv_id, t.turn_idx,
       e.start_offset AS offset_start, e.end_offset AS offset_end,
       e.mention_text AS lexical_variant,
       cast(e.omop_concept_id AS bigint) AS note_nlp_concept_id,
       CASE WHEN e.assertion = 'absent' THEN 'N' ELSE 'Y' END AS term_exists,
       e.temporality AS term_temporal
FROM turns t JOIN exp e USING (tmpl)
WHERE e.omop_concept_id > 0"""


def _oracle_link_cascade() -> str:
    ont = _ont()
    concept_rows = [
        (c["concept_id"], c["concept_name"], c["vocabulary_id"], c["domain_id"])
        for c in ont.concepts
    ]
    synonym_rows = [(s["concept_id"], s["concept_synonym_name"]) for s in ont.synonyms]
    term_rows = [(t,) for t in _CASCADE_TERMS]
    return f"""WITH terms(term) AS (VALUES {_values(term_rows)}),
concepts(concept_id, concept_name, vocabulary_id, domain_id) AS (VALUES {_values(concept_rows)}),
synonyms(concept_id, concept_synonym_name) AS (VALUES {_values(synonym_rows)}),
t AS (SELECT term, length(term) AS q_len, list_distinct(string_split(term, ' ')) AS q_tokens FROM terms),
dim AS (SELECT concept_id, concept_name, vocabulary_id, domain_id,
               lower(concept_name) AS cn_lower, length(concept_name) AS cn_len,
               list_distinct(string_split(
                 regexp_replace(trim(regexp_replace(lower(concept_name), '\\s+', ' ', 'g')),
                                '^[^a-z0-9_]+|[^a-z0-9_]+$', '', 'g'), ' ')) AS cn_tokens
        FROM concepts),
t1 AS (SELECT t.term, d.concept_id, d.concept_name, d.vocabulary_id, d.domain_id,
              1.0 AS score, 'exact' AS method, 1 AS tier
       FROM t JOIN dim d ON t.term = d.cn_lower),
t2 AS (SELECT t.term, d.concept_id, d.concept_name, d.vocabulary_id, d.domain_id,
              0.95 AS score, 'exact' AS method, 2 AS tier
       FROM t JOIN synonyms s ON t.term = lower(s.concept_synonym_name)
       JOIN dim d ON d.concept_id = s.concept_id),
cheap AS (SELECT * FROM t1 UNION ALL SELECT * FROM t2),
counts AS (SELECT term, count(DISTINCT concept_id) AS n_cheap FROM cheap GROUP BY 1),
need AS (SELECT t.* FROM t LEFT JOIN counts c USING (term) WHERE coalesce(c.n_cheap, 0) < 5),
t3 AS (SELECT n.term, d.concept_id, d.concept_name, d.vocabulary_id, d.domain_id,
              least(0.9, n.q_len / d.cn_len + 0.3) AS score, 'fuzzy' AS method, 3 AS tier
       FROM need n JOIN dim d ON d.cn_lower LIKE n.term || '%'
       WHERE n.q_len >= 3),
multi AS (SELECT *, list_reduce(string_split(term, ' '),
                 (a, b) -> CASE WHEN length(b) > length(a) THEN b ELSE a END) AS main_word
          FROM need WHERE len(string_split(term, ' ')) >= 2),
t4 AS (SELECT m.term, d.concept_id, d.concept_name, d.vocabulary_id, d.domain_id,
              cast(len(list_intersect(m.q_tokens, d.cn_tokens)) AS double)
                / len(list_distinct(m.q_tokens || d.cn_tokens)) AS score,
              'fuzzy' AS method, 4 AS tier
       FROM multi m JOIN dim d ON contains(d.cn_lower, m.main_word)
       WHERE length(m.main_word) >= 4
         AND cast(len(list_intersect(m.q_tokens, d.cn_tokens)) AS double)
               / len(list_distinct(m.q_tokens || d.cn_tokens)) >= 0.3),
unioned AS (SELECT * FROM cheap UNION ALL SELECT * FROM t3 UNION ALL SELECT * FROM t4),
dedup AS (SELECT *, row_number() OVER (PARTITION BY term, concept_id ORDER BY tier) AS dup
          FROM unioned),
ranked AS (SELECT *, row_number() OVER (PARTITION BY term ORDER BY tier, concept_id) AS rank
           FROM dedup WHERE dup = 1)
SELECT term, cast(concept_id AS bigint) AS concept_id, concept_name, vocabulary_id,
       CASE WHEN lower(domain_id) IN ('condition','drug','measurement','procedure','observation','device')
            THEN lower(domain_id) ELSE 'observation' END AS domain_id,
       cast(score AS double) AS score, method, cast(rank AS int) AS rank
FROM ranked WHERE rank <= 5"""


def _oracle_kg_canonical() -> str:
    rel_rows = [
        (r["concept_id_1"], r["concept_id_2"], r["relationship_id"])
        for r in _ont().relationships
    ]
    return f"""WITH RECURSIVE rel(a, b, r) AS (VALUES {_values(rel_rows)}),
alias_e AS (
  SELECT a AS src, b AS dst FROM rel WHERE r IN ('Maps to', 'Mapped from') AND a <> b
  UNION
  SELECT b, a FROM rel WHERE r IN ('Maps to', 'Mapped from') AND a <> b),
reach(v, w) AS (
  SELECT src, dst FROM alias_e
  UNION
  SELECT r.v, e.dst FROM reach r JOIN alias_e e ON r.w = e.src),
comp AS (SELECT v AS concept_id, least(v, min(w)) AS component_id FROM reach GROUP BY v),
sources AS (SELECT DISTINCT a AS concept_id FROM rel WHERE r = 'Maps to'),
targets AS (SELECT DISTINCT b AS concept_id FROM rel WHERE r = 'Maps to'),
terminals AS (SELECT concept_id FROM targets
              WHERE concept_id NOT IN (SELECT concept_id FROM sources)),
comp_term AS (SELECT c.component_id, min(c.concept_id) AS terminal_id
              FROM comp c JOIN terminals tm ON c.concept_id = tm.concept_id GROUP BY 1),
comp_min AS (SELECT component_id, min(concept_id) AS min_id FROM comp GROUP BY 1)
SELECT cast(c.concept_id AS bigint) AS concept_id,
       cast(coalesce(ct.terminal_id, m.min_id) AS bigint) AS canonical_concept_id
FROM comp c
JOIN comp_min m USING (component_id)
LEFT JOIN comp_term ct USING (component_id)
WHERE c.concept_id <> coalesce(ct.terminal_id, m.min_id)"""


def _oracle_rank_topk_orders() -> str:
    return """SELECT o_custkey, o_orderkey, o_totalprice, cast(rk AS int) AS rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders)
WHERE rk <= 3"""


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG-construction pipeline on sf0.001-derived transcripts."""
    return _q_kg_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kg_mentions": _q_kg_mentions,
        "kg_candidates": _q_kg_candidates,
        "kg_facts": _q_kg_facts,
        "kg_triples": _q_kg_triples,
        "kg_domain_counts": _q_kg_domain_counts,
        "kg_nodes": _q_kg_nodes,
        "omop_note_nlp": _q_omop_note_nlp,
        "link_cascade": _q_link_cascade,
        "kg_canonical": _q_kg_canonical,
        "rank_topk_orders": _q_rank_topk_orders,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "kg_mentions": _oracle_kg_mentions(),
        "kg_candidates": _oracle_kg_candidates(),
        "kg_facts": _oracle_kg_facts(),
        "kg_triples": _oracle_kg_triples(),
        "kg_domain_counts": _oracle_kg_domain_counts(),
        "kg_nodes": _oracle_kg_nodes(),
        "omop_note_nlp": _oracle_omop_note_nlp(),
        "link_cascade": _oracle_link_cascade(),
        "kg_canonical": _oracle_kg_canonical(),
        "rank_topk_orders": _oracle_rank_topk_orders(),
    }
