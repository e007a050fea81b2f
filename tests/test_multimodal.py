"""Multimodal binary-column plumbing (decode stubbed, Spark side real)."""

import pytest
from pyspark.sql import functions as F

from kgnorm import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"payload text {i} " * (i + 1), "en", "s0", 10) for i in range(9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return multimodal.media_from_documents(docs)


def test_media_schema_and_kinds(media):
    rows = media.collect()
    assert {r.kind for r in rows} == {"image", "audio", "video"}
    for r in rows:
        assert isinstance(r.payload, (bytes, bytearray))
        assert r.n_bytes == len(r.payload)


def test_real_decode_is_stubbed(spark, media):
    import pytest as _pt

    from py4j.protocol import Py4JJavaError

    df = multimodal.extract_features(media, fake=False)
    with _pt.raises(Exception) as exc:
        df.collect()
    assert "NotImplementedError" in str(exc.value) or "codec" in str(exc.value)


def test_fake_decode_plumbing(media):
    feats = multimodal.extract_features(media, fake=True).collect()
    assert len(feats) == 9
    for r in feats:
        assert len(r.feature) == 8
        assert r.width >= 16 and r.height >= 16 and 1 <= r.n_channels <= 3
        assert r.n_bytes > 0


def test_fake_decode_deterministic(media):
    a = sorted((r.media_id, r.width, r.height) for r in multimodal.extract_features(media, fake=True).collect())
    b = sorted((r.media_id, r.width, r.height) for r in multimodal.extract_features(media, fake=True).collect())
    assert a == b


def test_frame_sample_plan(media):
    plan = multimodal.frame_sample_plan(media, fps=1.0, duration_bytes_per_sec=10).collect()
    assert all(r.frame_idx >= 0 and r.byte_offset == r.frame_idx * 10 for r in plan)
    by_media = {}
    for r in plan:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    for media_id, frames in by_media.items():
        assert sorted(frames) == list(range(len(frames)))  # dense 0..n-1
