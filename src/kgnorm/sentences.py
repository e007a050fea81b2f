"""Standalone sentence segmentation with character positions.

Port of ``backend/app/services/extraction_pipeline.py:154-173``: the
boundary regex ``[.!?]+(?:\\s|$)|\\n\\n+``, each sentence spanning from
the previous boundary's end THROUGH its own terminator (the reference
includes the punctuation and trailing whitespace in the span, then
strips the text), plus the trailing-remainder rule.

This is the one extraction op whose output is inherently positional
(spans into the original text), so it runs as the same Arrow-batched
kernel shape as the main extraction UDF (kgnorm/extract.py) — a
pandas_udf producing an array of (start, end, sentence) structs, one
Arrow batch per ~10k turns, never a per-row Python call.
"""

from __future__ import annotations

import re

import pandas as pd  # module-level: pandas_udf resolves the Series annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_BOUNDARY = re.compile(r"[.!?]+(?:\s|$)|\n\n+")

SENTENCE_TYPE = T.ArrayType(T.StructType([
    T.StructField("start", T.IntegerType()),
    T.StructField("end", T.IntegerType()),
    T.StructField("sentence", T.StringType()),
]))


def segment_sentences(text: str) -> list[tuple[int, int, str]]:
    """Pure-Python kernel (extraction_pipeline.py:154-173)."""
    if not text:
        return []
    out: list[tuple[int, int, str]] = []
    last_end = 0
    for m in _BOUNDARY.finditer(text):
        sentence = text[last_end:m.end()].strip()
        if sentence:
            out.append((last_end, m.end(), sentence))
        last_end = m.end()
    if last_end < len(text):
        remaining = text[last_end:].strip()
        if remaining:
            out.append((last_end, len(text), remaining))
    return out


def sentences_df(transcripts: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per sentence: (…keys, sent_idx, start, end, sentence)."""
    def _kernel(col: pd.Series) -> pd.Series:
        return col.map(lambda t: segment_sentences(t if t is not None else ""))

    seg = F.pandas_udf(_kernel, SENTENCE_TYPE)
    keys = [c for c in ("conv_id", "turn_idx") if c in transcripts.columns]
    return transcripts.select(
        *keys, F.posexplode(seg(F.col(text_col))).alias("sent_idx", "s")
    ).select(*keys, "sent_idx", "s.start", "s.end", "s.sentence")
