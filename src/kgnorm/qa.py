"""Clinical question answering over the document corpus.

Port of ``backend/app/services/semantic_qa.py`` QA path:

* question classification by the ordered regex table (:183-206,
  :494-500) — dict insertion order is semantic: YES_NO, LIST, TEMPORAL,
  COMPARATIVE, CAUSAL, then the FACTUAL fallback; ``pattern.search``
  (anywhere in the question), first hit wins;
* context = top-5 hybrid-search results' content (each truncated to
  500 chars, :343/:385) joined with blank lines (:463-466);
* relevant-sentence selection (:502-529): split on ``[.!?]``, keep a
  sentence when its token set overlaps the question's OR when any
  clinical term appears in BOTH the sentence and the question;
* per-type answer builders (:556-617): yes/no by affirmative-vs-
  negative (sentence, term) pair counts, list by comma/semicolon item
  harvesting (3 < len < 100, order-preserving dedup, 10 cap), temporal
  by the first dated sentence, factual by the first sentence;
* confidence = min(n_relevant / 5, 1.0), or 0.3 with no evidence
  (:531-532); static follow-ups per type (:638-660).

Spark-first split: the expensive part — scoring every (question, doc)
pair — is the distributed ``semsearch.hybrid_search``; answer assembly
then runs on ONE row per question (top-5 contexts collected per
question), as an Arrow-batched kernel shared verbatim with the pure-
Python tests.  Questions are a tiny dimension; documents are the
100-TB side, and they only ever flow through the search joins.
"""

from __future__ import annotations

import re

import pandas as pd  # module-level: pandas_udf resolves Series annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from kgnorm import semsearch

# :183-206 — ORDER IS SEMANTIC
QUESTION_PATTERNS: list[tuple[str, list[re.Pattern]]] = [
    ("yes_no", [re.compile(r"^(is|does|has|did|was|are|were|do|can|could|should|would)\s", re.I)]),
    ("list", [
        re.compile(r"^(list|what are|show|give me|enumerate)\s", re.I),
        re.compile(r"all\s+(the\s+)?(medications|diagnoses|conditions|labs|procedures)", re.I),
    ]),
    ("temporal", [re.compile(r"\b(when|what time|what date|how long|since when|last|recent|latest|first)\b", re.I)]),
    ("comparative", [
        re.compile(r"\b(compare|comparison|versus|vs|change|trend|differ|better|worse)\b", re.I),
        re.compile(r"how (has|have|did).*(change|improve|worsen)", re.I),
    ]),
    ("causal", [re.compile(r"\b(why|cause|reason|because|due to|explain)\b", re.I)]),
    ("factual", [re.compile(r"^(what|which|who|where|how much|how many)\s", re.I)]),
]

CLINICAL_TERMS = ["medication", "diagnosis", "condition", "lab", "vital", "procedure",
                  "blood pressure", "a1c", "glucose", "weight", "pain"]  # :507-508

AFFIRMATIVE = ["has", "is", "does", "diagnosed", "taking", "positive", "confirmed"]  # :562
NEGATIVE = ["no", "not", "negative", "denied", "absent", "without"]  # :563

_DATE_RE = re.compile(
    r"\b\d{1,2}[/-]\d{1,2}[/-]\d{2,4}\b|\b\d{4}-\d{2}-\d{2}\b|"
    r"\b(January|February|March|April|May|June|July|August|September|October|November|December)"
    r"\s+\d{1,2},?\s+\d{4}\b", re.I)

FOLLOW_UPS = {  # :638-660
    "yes_no": ["When was this first documented?", "What is the current status?"],
    "list": ["Which of these is most recent?", "Are there any changes to this list?"],
    "temporal": ["What was the value at that time?", "How has this changed since then?"],
}
DEFAULT_FOLLOW_UPS = ["What are the related conditions?", "What is the treatment plan?"]

_TOKEN_RE = re.compile(r"\b\w+\b")


def classify_question(question: str) -> str:
    """(:494-500): ordered search, factual fallback."""
    for q_type, patterns in QUESTION_PATTERNS:
        for p in patterns:
            if p.search(question):
                return q_type
    return "factual"


def relevant_sentences(question: str, context: str) -> list[str]:
    """(:502-517): token overlap OR shared clinical term."""
    q_tokens = set(_TOKEN_RE.findall(question.lower()))
    ql = question.lower()
    out = []
    for sentence in re.split(r"[.!?]", context):
        s_tokens = set(_TOKEN_RE.findall(sentence.lower()))
        sl = sentence.lower()
        if (q_tokens & s_tokens) or any(
            t in sl for t in CLINICAL_TERMS if t in ql
        ):
            # appended stripped, unconditionally on a predicate hit
            # (:511-517) — a hit requires tokens or terms, so the strip
            # is never empty
            out.append(sentence.strip())
    return out


def build_answer(question: str, q_type: str, sentences: list[str]) -> str:
    """(:556-617)."""
    if q_type == "yes_no":
        if not sentences:
            return "I couldn't find enough information to answer definitively."
        aff = sum(1 for s in sentences for a in AFFIRMATIVE if a in s.lower())
        neg = sum(1 for s in sentences for n in NEGATIVE if n in s.lower())
        if aff > neg:
            return f"Yes, based on the available information. {sentences[0]}"
        if neg > aff:
            return f"No, based on the available information. {sentences[0]}"
        return f"The information is inconclusive. Relevant context: {sentences[0]}"
    if q_type == "list":
        if not sentences:
            return "No relevant items found."
        items = []
        for sentence in sentences:
            for part in re.split(r"[,;]", sentence):
                part = part.strip()
                if 3 < len(part) < 100:
                    items.append(part)
        if items:
            unique = list(dict.fromkeys(items))[:10]
            return "Found the following:\n• " + "\n• ".join(unique)
        return f"Based on the records: {sentences[0]}"
    if q_type == "temporal":
        if not sentences:
            return "No temporal information found."
        for s in sentences:
            if _DATE_RE.search(s):
                return f"Based on the records: {s}"
        return f"Temporal context from records: {sentences[0]}"
    if not sentences:
        return "I couldn't find specific information to answer this question."
    return f"Based on the clinical records: {sentences[0]}"


def answer_one(question: str, context: str) -> dict:
    """Full single-question kernel (shared with tests and the UDF)."""
    q_type = classify_question(question)
    sentences = relevant_sentences(question, context)
    answer = build_answer(question, q_type, sentences)
    confidence = min(len(sentences) / 5, 1.0) if sentences else 0.3
    return {
        "question_type": q_type,
        "answer": answer,
        "confidence": round(confidence, 6),
        "n_evidence": min(len(sentences), 5),
        "follow_ups": "; ".join(FOLLOW_UPS.get(q_type, DEFAULT_FOLLOW_UPS)[:3]),
    }


_ANSWER_TYPE = T.StructType([
    T.StructField("question_type", T.StringType()),
    T.StructField("answer", T.StringType()),
    T.StructField("confidence", T.DoubleType()),
    T.StructField("n_evidence", T.IntegerType()),
    T.StructField("follow_ups", T.StringType()),
])


def answer_questions(
    docs: DataFrame,
    spark: SparkSession,
    questions: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """QA over the corpus (:437-492): hybrid search narrows the lake to
    top-5 docs per question; the answer kernel runs on one collected
    row per question."""
    hits = semsearch.hybrid_search(docs, spark, questions, max_results=5,
                                   id_col=id_col, text_col=text_col)
    with_text = hits.join(
        docs.select(F.col(id_col).alias("doc_id"),
                    F.substring(F.col(text_col), 1, 500).alias("_content")),
        "doc_id",
    )
    ctx = with_text.groupBy("query").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("rank", "_content"))),
                        lambda s: s["_content"]),
            "\n\n",
        ).alias("context"),
        F.count("*").alias("n_sources"),
    )
    # questions with zero hits still get the no-evidence answer
    qdf = spark.createDataFrame([(q,) for q in questions], ["query"])
    full = qdf.join(ctx, "query", "left").na.fill({"context": "", "n_sources": 0})

    def _kernel(q: pd.Series, c: pd.Series) -> pd.DataFrame:
        # StructType pandas_udf contract: return a DataFrame whose
        # columns are the struct fields
        return pd.DataFrame([answer_one(a, b) for a, b in zip(q, c)],
                            columns=[f.name for f in _ANSWER_TYPE.fields])

    kernel = F.pandas_udf(_kernel, _ANSWER_TYPE)
    return full.select(
        F.col("query").alias("question"), "n_sources",
        kernel(F.col("query"), F.col("context")).alias("a"),
    ).select("question", "n_sources", "a.question_type", "a.answer",
             "a.confidence", "a.n_evidence", "a.follow_ups")
