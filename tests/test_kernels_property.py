"""Property-based tests (hypothesis) for the pure-Python kernels that
Arrow UDFs and oracles share — these are the single sources of truth
for several driver queries, so they get adversarial inputs here."""

import re

from hypothesis import given, settings, strategies as st

from kgnorm import ner, qa
from kgnorm.sentences import segment_sentences

TEXT = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N", "P", "Z"),
                           whitelist_characters="\n.!? "),
    max_size=300,
)


class TestSentenceProperties:
    @given(TEXT)
    @settings(max_examples=200, deadline=None)
    def test_spans_reconstruct_and_order(self, text):
        out = segment_sentences(text)
        last_end = 0
        for start, end, sentence in out:
            # spans are in-order, non-overlapping, within bounds
            assert 0 <= start <= end <= len(text)
            assert start >= last_end
            last_end = end
            # the stripped slice IS the sentence (reference :160-165)
            assert text[start:end].strip() == sentence
            assert sentence != ""

    @given(TEXT)
    @settings(max_examples=200, deadline=None)
    def test_every_nonspace_char_is_covered(self, text):
        out = segment_sentences(text)
        covered = set()
        for start, end, _s in out:
            covered.update(range(start, end))
        # chars outside all spans are only boundary/whitespace residue
        for i, ch in enumerate(text):
            if i not in covered:
                assert ch in ".!?" or ch.isspace()


class TestQAProperties:
    @given(st.text(max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_classify_total_and_valid(self, q):
        out = qa.classify_question(q)
        assert out in {"yes_no", "list", "temporal", "comparative",
                       "causal", "factual"}

    @given(st.text(max_size=150), st.text(max_size=400))
    @settings(max_examples=150, deadline=None)
    def test_answer_one_total(self, q, ctx):
        out = qa.answer_one(q, ctx)
        assert 0.0 <= out["confidence"] <= 1.0
        assert 0 <= out["n_evidence"] <= 5
        assert out["answer"]

    @given(st.text(max_size=120), st.text(max_size=400))
    @settings(max_examples=150, deadline=None)
    def test_relevant_sentences_subset(self, q, ctx):
        rel = qa.relevant_sentences(q, ctx)
        raw = [s.strip() for s in re.split(r"[.!?]", ctx)]
        for s in rel:
            assert s in raw


class TestNERProperties:
    @given(st.text(alphabet=st.characters(whitelist_categories=("L", "Z")),
                   max_size=200))
    @settings(max_examples=150, deadline=None)
    def test_postprocess_invariants(self, text):
        out = ner.postprocess(text, ner.fake_model_fn(text))
        for m in out:
            assert m["confidence"] >= ner.MIN_CONFIDENCE
            assert len(m["mention_text"].strip()) >= ner.MIN_ENTITY_LENGTH
            assert m["domain_hint"] is not None
            assert m["assertion"] in {"present", "absent", "possible"}
            assert text[m["start_offset"]:m["end_offset"]] == m["mention_text"]

    @given(st.lists(st.tuples(st.integers(0, 50), st.integers(1, 10)),
                    max_size=8),
           st.lists(st.tuples(st.integers(0, 50), st.integers(1, 10)),
                    max_size=8))
    @settings(max_examples=150, deadline=None)
    def test_merge_never_overlaps_transformer(self, tspans, sspans):
        t_ents = [{"word": "t", "start": a, "end": a + n,
                   "entity_group": "PROBLEM", "score": 0.9,
                   "source": "transformer"} for a, n in tspans]
        s_ents = [{"word": "s", "start": a, "end": a + n,
                   "entity_group": "PROBLEM", "score": 0.6,
                   "source": "spacy"} for a, n in sspans]
        merged = ner.merge_entities(t_ents, s_ents)
        t_cover = set()
        for e in t_ents:
            t_cover.update(range(e["start"], e["end"]))
        for e in merged:
            if e["source"] == "spacy":
                assert not any(i in t_cover
                               for i in range(e["start"], e["end"]))
        # every transformer entity survives
        assert sum(1 for e in merged if e["source"] == "transformer") == len(t_ents)
