"""Pin the deterministic model stand-ins byte-for-byte (README
"Model assets" contract): the DuckDB oracles define parity ON these
stand-ins, so a silent change to either must break loudly here before
it breaks the driver's value-hash gate.

Real-model swap-in (HuggingFace NER / sentence-transformers embedder)
is revalidated against the reference P/R gate instead — these tests
guard only the sandbox/test tier.
"""

import math

from kgnorm import ner, semantic


def test_fake_ner_model_pinned():
    text = "Possible pneumonia; started metformin. Hemoglobin stable. x"
    out = ner.fake_batch_model_fn([text])
    assert out == [[
        {"word": "pneumonia", "start": 9, "end": 18, "entity_group": "B-PROBLEM",
         "score": 0.92, "source": "transformer"},
        {"word": "metformin", "start": 28, "end": 37, "entity_group": "B-TREATMENT",
         "score": 0.88, "source": "transformer"},
        {"word": "Hemoglobin", "start": 39, "end": 49, "entity_group": "B-TEST",
         "score": 0.8, "source": "transformer"},
        {"word": "x", "start": 58, "end": 59, "entity_group": "B-PROBLEM",
         "score": 0.92, "source": "transformer"},
    ]]


def test_fake_ner_batch_stability():
    texts = ["pneumonia", "", "metformin and pneumonia"]
    a = ner.fake_batch_model_fn(texts)
    b = ner.fake_batch_model_fn(list(texts))
    assert a == b
    assert a[1] == []


def test_batched_encoder_contract():
    """The encode kernel issues ONE encode_fn call per Arrow batch with
    every non-null term, mirroring the NER batching contract."""
    import pandas as pd

    calls = []

    def counting_encode(texts):
        calls.append(list(texts))
        return semantic.batch_hash_embed(texts)

    col = pd.Series(["metformin", None, "aspirin"])
    out = semantic._encode_kernel(counting_encode)(col)
    assert calls == [["metformin", "aspirin"]]
    assert out[0] == semantic.hash_embed("metformin")
    assert out[1] == [0.0] * semantic.EMB_DIM  # None short-circuits
    assert out[2] == semantic.hash_embed("aspirin")
    assert semantic.batch_hash_embed(["a", "b"]) == [
        semantic.hash_embed("a"), semantic.hash_embed("b")]


def test_hash_embed_pinned():
    v = semantic.hash_embed("Metformin")
    assert len(v) == semantic.EMB_DIM
    # unit-norm, deterministic bucket placement
    assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-12)
    nz = {i: round(x, 6) for i, x in enumerate(v) if x != 0.0}
    assert nz == {11: 0.301511, 14: 0.301511, 16: 0.603023, 19: 0.301511,
                  23: 0.301511, 41: 0.301511, 46: 0.301511, 51: 0.301511}
    # normalization contract: strip + lower; empty → zero vector
    assert semantic.hash_embed("  METFORMIN  ") == v
    assert semantic.hash_embed("   ") == [0.0] * semantic.EMB_DIM
