"""Clinical QA — behavior pinned against
backend/app/services/semantic_qa.py (:183-206, :437-660)."""

import pytest

from kgnorm import qa


class TestClassification:
    def test_ordered_first_match(self):
        assert qa.classify_question("Is the patient diabetic?") == "yes_no"
        assert qa.classify_question("List all the medications") == "list"
        # 'what are' is a LIST prefix even with temporal words later —
        # dict insertion order is semantic (:494-500)
        assert qa.classify_question("what are the recent labs") == "list"
        assert qa.classify_question("When was the last A1c?") == "temporal"
        assert qa.classify_question("How has the trend changed?") == "temporal" \
            or qa.classify_question("How has the trend changed?") == "comparative"
        assert qa.classify_question("Why did the glucose rise?") == "causal"
        assert qa.classify_question("What is the dose?") == "factual"
        assert qa.classify_question("tell me about it") == "factual"  # fallback

    def test_temporal_word_anywhere(self):
        # TEMPORAL uses \\b search, not a prefix anchor
        assert qa.classify_question("give the latest value") == "temporal"


class TestRelevance:
    def test_token_overlap(self):
        s = qa.relevant_sentences("glucose level", "The glucose was high. Sky is blue.")
        assert s == ["The glucose was high"]

    def test_clinical_term_bridge(self):
        # 'a1c' is in both question and sentence but shares no token with
        # the question? it does share... use 'blood pressure' (two words)
        s = qa.relevant_sentences(
            "how is the blood pressure", "Elevated blood pressure noted. Unrelated text.")
        assert "Elevated blood pressure noted" in s

    def test_no_overlap(self):
        assert qa.relevant_sentences("zzz", "nothing here") == []


class TestAnswers:
    def test_yes_no_affirmative(self):
        out = qa.answer_one("Is the patient taking metformin?",
                            "Patient is taking metformin daily. The patient dose confirmed.")
        assert out["question_type"] == "yes_no"
        assert out["answer"].startswith("Yes, based on the available information.")
        assert out["n_evidence"] == 2

    def test_yes_no_negative(self):
        out = qa.answer_one("Does the patient smoke?",
                            "Patient denied smoking. No tobacco without exception.")
        # note: 'denied'/'no'/'not'/'without' beat the 'does' affirmative
        assert out["answer"].startswith("No, based on the available information.")

    def test_yes_no_no_evidence(self):
        out = qa.answer_one("Is it so?", "zzz qqq")
        assert out["answer"] == \
            "I couldn't find enough information to answer definitively."
        assert out["confidence"] == 0.3

    def test_list_items(self):
        out = qa.answer_one(
            "List all the medications",
            "Current medications include metformin 500mg, lisinopril 10mg; aspirin 81mg.")
        assert out["question_type"] == "list"
        assert out["answer"].startswith("Found the following:\n•")
        assert "lisinopril 10mg" in out["answer"]

    def test_temporal_prefers_dated_sentence(self):
        out = qa.answer_one(
            "When was the last visit?",
            "The visit was productive. Follow-up on 2024-03-01 was the last visit.")
        assert out["answer"] == ("Based on the records: Follow-up on 2024-03-01 "
                                 "was the last visit")

    def test_factual(self):
        out = qa.answer_one("What is the current dose?",
                            "The current dose is 500mg. Other text.")
        assert out["answer"].startswith("Based on the clinical records: The current dose")

    def test_confidence_scaling(self):
        ctx = ". ".join(f"the dose fact {i}" for i in range(7))
        out = qa.answer_one("what is the dose", ctx)
        assert out["confidence"] == 1.0  # min(7/5, 1)
        assert out["n_evidence"] == 5    # evidence capped at 5


class TestSparkPath:
    def test_answer_questions(self, spark):
        docs = spark.createDataFrame(
            [(1, "the table scan is fast. confirmed by tests."),
             (2, "nothing relevant whatsoever here")],
            "doc_id long, text string")
        out = {r["question"]: r for r in
               qa.answer_questions(docs, spark,
                                   ["is the table scan fast",
                                    "zzz unanswerable"]).collect()}
        a = out["is the table scan fast"]
        assert a["question_type"] == "yes_no"
        assert a["n_sources"] >= 1
        assert a["answer"].startswith("Yes, based on the available information.")
        b = out["zzz unanswerable"]
        assert b["n_sources"] == 0
        assert b["confidence"] == 0.3
