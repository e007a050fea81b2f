"""kgnorm — a PySpark-native clinical knowledge-graph construction engine.

Re-implements the query/data-processing capabilities of the reference
clinical-ontology-normalizer (a FastAPI/Postgres/RQ row-at-a-time service)
as an idiomatic Spark batch pipeline over a table of conversation
transcripts ``(conv_id, turn_idx, role, text, tool, ts)``:

    transcripts → extract (broadcast Aho-Corasick + context rules, Arrow UDF)
                → link (broadcast dictionary join + tiered anti-join cascade)
                → facts (5-part dedup key, noisy-OR merge, distributed agg)
                → canonicalize (Maps-to closure via hash-min connected components)
                → graph (node/edge/triple materialization, deterministic ids)

Everything here is from-scratch Spark-first design; reference file:line
citations in docstrings mark behavioral parity points only.
"""

__version__ = "0.1.0"
