"""Ensemble span-overlap merge (kgnorm.ensemble).

Mirrors reference nlp_ensemble.py semantics: overlap ratio vs smaller
span, greedy merge with domain-preference / longer-span / higher-
confidence replacement, +0.10 agreement boost capped at 0.99, and the
0.5 post-merge confidence filter.
"""

from kgnorm import ensemble as ens


def m(source, text, start, end, domain="condition", conf=0.9):
    return ens.EnsembleMention(
        source=source, text=text, lexical_variant=text.lower(),
        start_offset=start, end_offset=end, domain=domain, confidence=conf,
    )


class TestSpanOverlap:
    def test_complete_overlap(self):
        assert ens.spans_overlap(0, 10, 0, 10)

    def test_partial_overlap(self):
        assert ens.spans_overlap(0, 10, 5, 15)

    def test_contained_span(self):
        assert ens.spans_overlap(0, 20, 5, 10)

    def test_no_overlap(self):
        assert not ens.spans_overlap(0, 10, 15, 25)

    def test_adjacent_spans(self):
        assert not ens.spans_overlap(0, 10, 10, 20)

    def test_small_overlap_below_threshold(self):
        assert not ens.spans_overlap(0, 10, 9, 20, threshold=0.5)


class TestMerge:
    def test_non_overlapping_kept(self):
        merged = ens.merge_mentions({
            "rule_based": [m("rule_based", "diabetes", 0, 8)],
            "value": [m("value", "BP 120/80", 20, 29, "measurement")],
        })
        assert len(merged) == 2

    def test_agreement_boost_capped(self):
        merged = ens.merge_mentions({
            "rule_based": [m("rule_based", "diabetes", 0, 8, conf=0.95)],
            "pattern": [m("pattern", "diabetes", 0, 8, conf=0.90)],
        })
        assert len(merged) == 1
        # incumbent (0.95) wins: pattern is not condition-preferred, not
        # longer, not higher — boost 0.95 + 0.10 capped at 0.99
        assert merged[0].confidence == 0.99

    def test_longer_span_first_higher_confidence_still_replaces(self):
        # reference semantics: the longer span sorts first, but a shorter
        # HIGHER-confidence mention still replaces it (the should_replace
        # checks are independent ifs — nlp_ensemble.py:248-265)
        merged = ens.merge_mentions({
            "rule_based": [m("rule_based", "diabetes", 0, 8, conf=0.95)],
            "pattern": [m("pattern", "diabetes mellitus", 0, 17, conf=0.80)],
        })
        assert len(merged) == 1
        assert merged[0].text == "diabetes"
        assert merged[0].confidence == 0.95

    def test_longer_span_replaces_when_confidence_ties(self):
        merged = ens.merge_mentions({
            "rule_based": [m("rule_based", "diabetes", 0, 8, conf=0.80)],
            "pattern": [m("pattern", "diabetes mellitus", 0, 17, conf=0.80)],
        })
        assert len(merged) == 1
        assert merged[0].text == "diabetes mellitus"

    def test_incumbent_win_boosts_confidence(self):
        # losing challenger boosts the incumbent: 0.98 + 0.10 → cap 0.99
        merged = ens.merge_mentions({
            "pattern": [m("pattern", "diabetes", 0, 8, conf=0.98)],
            "rule_based": [m("rule_based", "diabetes", 0, 8, conf=0.85)],
        })
        assert len(merged) == 1
        assert merged[0].confidence == 0.99
        assert merged[0].source == "pattern"

    def test_domain_preference_value_wins_measurement(self):
        # measurement → 'value' preferred even at lower confidence
        merged = ens.merge_mentions({
            "rule_based": [m("rule_based", "creatinine", 0, 10, "measurement", 0.95)],
            "value": [m("value", "creatinine", 0, 10, "measurement", 0.90)],
        })
        assert len(merged) == 1
        assert merged[0].source == "value"

    def test_domain_preference_rule_based_wins_drug(self):
        merged = ens.merge_mentions({
            "pattern": [m("pattern", "metformin", 0, 9, "drug", 0.98)],
            "rule_based": [m("rule_based", "metformin", 0, 9, "drug", 0.85)],
        })
        assert len(merged) == 1
        assert merged[0].source == "rule_based"


class TestEndToEnd:
    def test_ensemble_for_text(self, automaton):
        text = "Medications: Metformin 1000mg po BID. Labs: creatinine 1.8 mg/dl."
        mentions = ens.ensemble_for_text(text, automaton)
        assert mentions
        assert all(mm.confidence >= ens.MIN_CONFIDENCE for mm in mentions)
        assert all(mm.confidence <= 1.0 for mm in mentions)
        # offsets index into the original text
        for mm in mentions:
            assert text[mm.start_offset:mm.end_offset] == mm.text

    def test_ensemble_mentions_df(self, spark, ontology_bundle):
        from kgnorm.ontology import broadcast_dictionary

        rows = [
            ("C1", 0, "Started metformin today for type 2 diabetes mellitus."),
            ("C1", 1, "Vitals: BP 140/90, HR 80."),
        ]
        df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "text"])
        bc = broadcast_dictionary(spark, ontology_bundle)
        out = ens.ensemble_mentions_df(df, bc, num_partitions=2).collect()
        assert out
        sources = {r.source for r in out}
        assert "value" in sources  # BP/HR values surfaced
        assert {"rule_based", "pattern"} & sources
