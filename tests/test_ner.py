"""ML NER post-processing — behavior pinned against
backend/app/services/nlp_clinical_ner.py (model inference pluggable;
the deterministic fake drives the real pipeline)."""

import pytest

from kgnorm import ner


class TestPostprocess:
    def test_domain_mapping_and_bio_stripping(self):
        text = "Patient has pneumonia near Springfield."
        out = ner.postprocess(text, ner.fake_model_fn(text))
        by_text = {m["mention_text"].lower(): m for m in out}
        assert by_text["pneumonia"]["domain_hint"] == "Condition"
        # GPE is a skipped entity type (ENTITY_TO_DOMAIN → None, :44-53)
        assert "springfield" not in by_text

    def test_confidence_calibration(self):
        text = "x" * 60
        ents = [
            {"word": "thing one", "start": 0, "end": 9,
             "entity_group": "B-PROBLEM", "score": 0.05, "source": "transformer"},
            {"word": "thing two", "start": 20, "end": 29,
             "entity_group": "PROBLEM", "score": 0.9, "source": "spacy"},
            {"word": "thing three", "start": 40, "end": 51,
             "entity_group": "PROBLEM", "score": 0.3, "source": "transformer"},
        ]
        out = {m["mention_text"]: m for m in ner.postprocess(text, ents)}
        # transformer score < 0.1 floored to 0.85 (:469-471)
        assert out["thing one"]["confidence"] == 0.85
        # spacy source forced to 0.60 regardless of score (:467-468)
        assert out["thing two"]["confidence"] == 0.60
        # 0.3 < min_confidence 0.5 → dropped (:473-475)
        assert "thing three" not in out

    def test_min_length_gate(self):
        ents = [{"word": "x", "start": 0, "end": 1,
                 "entity_group": "PROBLEM", "score": 0.9, "source": "transformer"}]
        assert ner.postprocess("x text", ents) == []

    def test_context_rules(self):
        t1 = "Patient denies pneumonia today."
        m1 = ner.postprocess(t1, ner.fake_model_fn(t1))[0]
        assert m1["assertion"] == "absent"
        # uncertainty beats negation and looks AFTER the span too (:270-275)
        t2 = "no pneumonia, but possible relapse"
        m2 = ner.postprocess(t2, ner.fake_model_fn(t2))[0]
        assert m2["assertion"] == "possible"
        t3 = "history of diabetes in the chart"
        m3 = ner.postprocess(t3, ner.fake_model_fn(t3))[0]
        assert m3["temporality"] == "historical"
        t4 = "mother with diabetes"
        m4 = ner.postprocess(t4, ner.fake_model_fn(t4))[0]
        assert m4["experiencer"] == "family"

    def test_merge_prefers_transformer(self):
        t_ents = [{"word": "pneumonia", "start": 10, "end": 19,
                   "entity_group": "PROBLEM", "score": 0.9, "source": "transformer"}]
        s_ents = [
            {"word": "pneumonia", "start": 10, "end": 19,
             "entity_group": "DISEASE", "score": 0.6, "source": "spacy"},
            {"word": "metformin", "start": 30, "end": 39,
             "entity_group": "DRUG", "score": 0.6, "source": "spacy"},
        ]
        merged = ner.merge_entities(t_ents, s_ents)
        # overlapping spaCy span dropped, non-overlapping kept (:372-404)
        assert len(merged) == 2
        assert {m["source"] for m in merged} == {"transformer", "spacy"}


class TestBatchedContract:
    def test_one_model_call_per_arrow_batch(self):
        """The GPU-batching contract: the kernel issues exactly ONE
        model_fn call per Arrow batch, passing every non-null text."""
        import pandas as pd

        calls = []

        def counting_fn(texts):
            calls.append(list(texts))
            return ner.fake_batch_model_fn(texts)

        col = pd.Series([
            "Patient has pneumonia.", None, "Taking metformin.", "no findings",
        ])
        out = ner._batch_kernel(counting_fn)(col)
        assert len(calls) == 1
        assert calls[0] == ["Patient has pneumonia.", "Taking metformin.", "no findings"]
        assert out[1] == []  # None text short-circuits to no mentions
        assert out[0][0]["mention_text"] == "pneumonia"
        assert out[2][0]["mention_text"] == "metformin"

    def test_batched_equals_single(self):
        texts = ["Patient denies pneumonia.", "", "hemoglobin 12 and diabetes"]
        batched = ner.fake_batch_model_fn(texts)
        assert batched == [ner.fake_model_fn(t) for t in texts]


class TestSparkPath:
    def test_ner_mentions_df(self, spark):
        t = spark.createDataFrame(
            [("C1", 0, "Patient denies pneumonia. Taking metformin daily.")],
            "conv_id string, turn_idx int, text string")
        rows = {r["mention_text"].lower(): r for r in
                ner.ner_mentions_df(t).collect()}
        assert rows["pneumonia"]["assertion"] == "absent"
        assert rows["pneumonia"]["domain_hint"] == "Condition"
        assert rows["metformin"]["domain_hint"] == "Drug"
        assert rows["metformin"]["confidence"] == 0.88
