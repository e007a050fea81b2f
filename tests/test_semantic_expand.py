"""Synonym expansion (kgnorm.expand/ontology) + semantic linking tier
(kgnorm.semantic)."""

import math

import pytest

from kgnorm import expand, ontology, rules, semantic
from kgnorm.ac import build_automaton


class TestExpansion:
    def test_abbreviation_expansion(self):
        got = expand.expand_synonyms(["htn"])
        assert "hypertension" in got
        assert "high blood pressure" in got
        assert "htn" in got  # original retained (set union)

    def test_spelling_variation(self):
        got = expand.expand_synonyms(["anemia"])
        assert "anaemia" in got

    def test_pattern_substitution(self):
        got = expand.expand_synonyms(["chronic kidney disease"])
        # 'chronic' → 'chr'/'c.', 'disease' → 'dis'/'disorder'
        assert "chr kidney disease" in got
        assert "chronic kidney disorder" in got

    def test_enhanced_dictionary_reaches_automaton(self, ontology_bundle):
        enhanced = ontology.enhanced_dictionary(ontology_bundle)
        base_keys = {k for k, _ in ontology_bundle.dictionary}
        keys = {k for k, _ in enhanced}
        assert base_keys <= keys
        # expansions of fixture abbreviations present and scannable
        auto = build_automaton(enhanced)
        mentions = rules.extract_mentions("Patient reports high blood pressure today.", auto)
        assert any(m.lexical_variant == "high blood pressure" for m in mentions)

    def test_enhanced_dictionary_first_wins(self, ontology_bundle):
        enhanced = ontology.enhanced_dictionary(ontology_bundle)
        keys = [k for k, _ in enhanced]
        assert len(keys) == len(set(keys))  # no duplicate surface keys


class TestHashEmbed:
    def test_unit_norm(self):
        v = semantic.hash_embed("heart failure")
        assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-9)

    def test_empty_is_zero(self):
        assert semantic.hash_embed("  ") == [0.0] * semantic.EMB_DIM

    def test_case_and_space_normalized(self):
        assert semantic.hash_embed(" Heart Failure ") == semantic.hash_embed("heart failure")

    def test_misspelling_close_unrelated_far(self):
        def cos(a, b):
            return sum(x * y for x, y in zip(a, b))

        hyp = semantic.hash_embed("hypertension")
        typo = semantic.hash_embed("hypertention")
        other = semantic.hash_embed("metformin")
        assert cos(hyp, typo) > 0.6
        assert cos(hyp, other) < 0.4


class TestSemanticTier:
    def test_semantic_candidates(self, spark, ontology_bundle):
        terms = spark.createDataFrame(
            [("hypertention",), ("heart failure",), ("zz",)], ["term"]
        )
        emb = semantic.concept_embeddings(spark, ontology_bundle.concepts)
        got = semantic.semantic_candidates(terms, emb).collect()
        by_term = {}
        for r in got:
            by_term.setdefault(r.term, []).append(r)
        # rank-1 hit is a heart-failure concept with a high score
        # (fixture vocabulary names it 'Congestive heart failure')
        hf = sorted(by_term["heart failure"], key=lambda r: r.rank)
        assert "heart failure" in hf[0].concept_name.lower()
        assert hf[0].score >= 0.6
        assert hf[0].score <= 0.85 + 1e-9  # multiplier caps exact match
        # misspelling retrieved
        assert any(r.concept_name.lower() == "essential hypertension"
                   or "hypertension" in r.concept_name.lower()
                   for r in by_term.get("hypertention", []))
        # garbage term: no hits above threshold
        assert "zz" not in by_term
