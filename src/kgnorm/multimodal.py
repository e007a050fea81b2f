"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for a 100-TB multimodal training-data pipeline: media travels as
an opaque ``binary`` column with a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through the driver and
each batch amortizes the Python-side codec cost.

The actual codecs (PIL / torchaudio / pyav) are NOT in this container,
so the decode kernels are STUBS: they raise ``NotImplementedError``
unless ``fake=True`` routes to a deterministic fake decoder.  Everything
Spark-side — schema, partitioning, UDF signature, Arrow batch shape — is
real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),          # image | audio | video
    T.StructField("payload", T.BinaryType(), True),        # opaque encoded bytes
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("content_md5", T.StringType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_channels", T.IntegerType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Fabricate an opaque-binary media table from the documents fixture
    (payload = utf-8 bytes; kind cycles by doc_id) — deterministic stand-in
    for real encoded media."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    payload = F.encode(F.col("text"), "utf-8")
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(kinds, (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int")).alias("kind"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5("text").alias("content_md5"),
    )


def _decode_image(payload: bytes) -> tuple[int, int, int]:
    """Real decoder would be PIL.Image.open(io.BytesIO(payload)).

    Stubbed: codecs are not available in this environment.
    """
    raise NotImplementedError("image codec not available; use fake=True for plumbing tests")


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake: dimensions derived from a content hash."""
    h = hashlib.md5(payload).digest()
    return 16 + h[0] % 640, 16 + h[1] % 480, 1 + h[2] % 3


def extract_features(media: DataFrame, fake: bool = False, batch_size: int = 256) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches of binary).

    The feature is an 8-dim float vector (fake path: byte histogram
    moments) — the real path would run an image/audio encoder per batch.
    """
    decode = _fake_decode if fake else _decode_image

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {c.name: [] for c in FEATURE_SCHEMA.fields}
            for media_id, kind, payload in zip(batch["media_id"], batch["kind"], batch["payload"]):
                w, h, c = decode(bytes(payload))
                n = len(payload)
                feat = [float(w), float(h), float(c), float(n),
                        float(n % 251), float(n % 127), float(n % 63), float(n % 31)]
                out["media_id"].append(media_id)
                out["kind"].append(kind)
                out["n_bytes"].append(n)
                out["width"].append(w)
                out["height"].append(h)
                out["n_channels"].append(c)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    # r6 (guide §8): no repartition — it shuffled the full BINARY payload
    # only to feed a stateless per-item decoder.  A storage scan is
    # already split by bytes (spark.sql.files.maxPartitionBytes), which
    # is exactly the right balance key for opaque payloads; the decoder
    # needs no co-location, and downstream aggregations re-shuffle the
    # (tiny) feature rows, never the bytes.
    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, fps: float = 1.0, duration_bytes_per_sec: int = 10) -> DataFrame:
    """Frame-sampling plan for video payloads — pure column expressions.

    Real decoders seek to byte offsets; here offsets are derived from the
    payload size (deterministic), one row per sampled frame."""
    n_frames = F.greatest(
        F.lit(1), F.floor(F.col("n_bytes") / duration_bytes_per_sec * fps).cast("int")
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "n_bytes", F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"))
        .withColumn("byte_offset", (F.col("frame_idx") * duration_bytes_per_sec).cast("long"))
    )
