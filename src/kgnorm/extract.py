"""Mention extraction stage: transcripts → mentions.

Spark plan::

    transcripts
      .repartition(N, conv_id)          # explicit partitioning (north rule);
                                        # co-locates a conversation's turns and
                                        # spreads work evenly before the UDF
      .mapInPandas(extract_batch)       # Arrow-batched; per batch: AC scan +
                                        # section parse + context rules
      → mentions (one row per mention, provenance (conv_id, turn_idx))

The dictionary travels as a Spark broadcast (list of AC entries); each
executor Python worker builds the automaton once and caches it for the
life of the process — the distributed analogue of the reference's
process-singleton vocabulary (backend/app/services/vocabulary.py:346-370).

The input ``text`` column is never mutated: mentions carry offsets into
the original text, and the per-turn text-equality invariant is asserted
by :func:`kgnorm.metrics.text_equality_check`.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.broadcast import Broadcast
from pyspark.sql import DataFrame, functions as F

from kgnorm import ac, rules, schemas

# Worker-process automaton cache, keyed by identity of the (deserialized,
# broadcast-manager-owned) entry list: one build per executor worker.
_AUTOMATON_CACHE: dict[int, Any] = {}

_MENTION_COLS = [f.name for f in schemas.MENTIONS.fields]


def _automaton_for(entries: list) -> Any:
    key = id(entries)
    auto = _AUTOMATON_CACHE.get(key)
    if auto is None:
        auto = ac.build_automaton(entries)
        _AUTOMATON_CACHE.clear()  # at most one dictionary per worker
        _AUTOMATON_CACHE[key] = auto
    return auto


def extract_mentions_df(
    transcripts: DataFrame,
    dictionary: Broadcast,
    num_partitions: int | None = None,
) -> DataFrame:
    """Run the extraction UDF over a transcripts DataFrame.

    Args:
        transcripts: DataFrame with the TRANSCRIPTS schema.
        dictionary: broadcast list of AC entries from
            :func:`kgnorm.ontology.broadcast_dictionary`.
        num_partitions: explicit partition count for the pre-UDF
            repartition; defaults to ``spark.sql.shuffle.partitions``.
    """
    spark = transcripts.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    def extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        auto = None
        # per-worker memo of text → extracted mentions.  Agent-transcript
        # corpora repeat turn texts heavily (tool banners, boilerplate,
        # canned replies); extraction is a pure function of the text, so
        # each distinct string is scanned once per worker.  Bounded to
        # keep the worker's footprint flat on high-cardinality corpora.
        import os as _os

        memo_enabled = not _os.environ.get("KGNORM_NO_MEMO")
        memo: dict[str, list] = {}
        memo_cap = 50_000 if memo_enabled else 0
        for batch in batches:
            if auto is None:
                auto = _automaton_for(dictionary.value)
            out: dict[str, list] = {c: [] for c in _MENTION_COLS}
            conv_ids = batch["conv_id"].to_numpy()
            turn_idxs = batch["turn_idx"].to_numpy()
            texts = batch["text"].to_numpy()
            for conv_id, turn_idx, text in zip(conv_ids, turn_idxs, texts):
                if text is None:
                    continue
                mentions = memo.get(text) if memo_enabled else None
                if mentions is None:
                    mentions = rules.extract_mentions(text, auto)
                    if memo_enabled:
                        if len(memo) >= memo_cap:
                            memo.clear()
                        memo[text] = mentions
                for m in mentions:
                    out["conv_id"].append(conv_id)
                    out["turn_idx"].append(int(turn_idx))
                    out["mention_text"].append(m.text)
                    out["start_offset"].append(m.start_offset)
                    out["end_offset"].append(m.end_offset)
                    out["lexical_variant"].append(m.lexical_variant)
                    out["section"].append(m.section)
                    out["assertion"].append(m.assertion)
                    out["temporality"].append(m.temporality)
                    out["experiencer"].append(m.experiencer)
                    out["confidence"].append(m.confidence)
                    out["domain_hint"].append(m.domain_hint)
                    out["omop_concept_id"].append(m.omop_concept_id)
            yield pd.DataFrame(out, columns=_MENTION_COLS)

    sel = transcripts.select("conv_id", "turn_idx", "text")
    if num_partitions:
        # explicit cap (bench scaling legs, job --partitions): strict
        # hash repartition on conv_id
        partitioned = sel.repartition(num_partitions, "conv_id")
    elif sel.isStreaming:
        partitioned = sel.repartition(n, "conv_id")
    else:
        # default batch path: REBALANCE(conv_id) keeps conversations
        # co-located (map-side combine stays total downstream) but,
        # unlike a strict repartition, licenses AQE to SPLIT a
        # pathologically hot conversation across tasks
        # (optimizeSkewsInRebalancePartitions) — harmless here because
        # extraction is stateless per turn and the facts groupBy
        # re-shuffles on the full fact key anyway
        partitioned = sel.hint("rebalance", "conv_id")
    return partitioned.mapInPandas(extract_batch, schema=schemas.MENTIONS)
