"""Advanced NLP enhancement (kgnorm.advanced).

Mirrors reference nlp_advanced.py: abbreviation disambiguation with
context scoring + first-context fallback, clause-aware negation with
boundary handling, compound conditions (embedded + pattern), ordered
laterality.
"""

from kgnorm import advanced as adv


class TestDisambiguation:
    def test_context_scored(self):
        text = "CT chest shows PE, started heparin for the clot, troponin negative"
        s = text.index("PE")
        ctx, exp = adv.disambiguate(text, "PE", s, s + 2)
        assert exp == "pulmonary embolism"
        assert ctx == "cardiology"

    def test_other_context(self):
        text = "PE: vitals normal, exam unremarkable, auscultation clear"
        ctx, exp = adv.disambiguate(text, "PE", 0, 2)
        assert exp == "physical exam"

    def test_zero_hits_falls_back_to_first_context(self):
        text = "xxxx PE yyyy"
        s = text.index("PE")
        ctx, exp = adv.disambiguate(text, "PE", s, s + 2)
        assert exp == "pulmonary embolism"  # first declared context

    def test_unknown_abbreviation(self):
        assert adv.disambiguate("QQQ here", "QQQ", 0, 3) == (None, None)


class TestClauseNegation:
    def test_pre_negation(self):
        text = "Patient denies chest pain at rest"
        s = text.index("chest pain")
        trig, bnd = adv.clause_negation(text, s, s + len("chest pain"))
        assert trig == "denies"

    def test_boundary_blocks_pre_negation(self):
        text = "no fever, but chest pain persists"
        s = text.index("chest pain")
        trig, _ = adv.clause_negation(text, s, s + len("chest pain"))
        # 'but' clause boundary between 'no' and the mention
        assert trig is None

    def test_post_negation(self):
        text = "pulmonary embolism ruled out by CT"
        trig, _ = adv.clause_negation(text, 0, len("pulmonary embolism"))
        assert trig == "ruled out"

    def test_boundary_blocks_post_negation(self):
        text = "pulmonary embolism; however test negative elsewhere"
        trig, _ = adv.clause_negation(text, 0, len("pulmonary embolism"))
        assert trig is None


class TestCompound:
    def test_embedded_abbreviation(self):
        mod, compound, base = adv.compound_condition("Dx: HFrEF stable", "HFrEF", 4, 9)
        assert base == "heart failure"
        assert "reduced EF" in mod

    def test_modifier_after(self):
        text = "heart failure with reduced EF noted"
        mod, compound, base = adv.compound_condition(text, "heart failure", 0, 13)
        assert mod == "with reduced EF (HFrEF)"
        assert compound.startswith("heart failure")

    def test_modifier_before(self):
        text = "history of uncontrolled hypertension for years"
        s = text.index("hypertension")
        mod, compound, base = adv.compound_condition(text, "hypertension", s, s + len("hypertension"))
        assert mod == "uncontrolled"

    def test_template_capture(self):
        text = "CKD stage 4 on file"
        mod, compound, base = adv.compound_condition(text, "CKD", 0, 3)
        assert mod == "stage 4"


class TestLaterality:
    def test_bilateral_before_left(self):
        text = "b/l lower extremity edema"
        s = text.index("edema")
        lat, lt = adv.laterality(text, "edema", s, s + 5)
        assert lat == "bilateral"  # 'b/l' must not match as 'l' (left)

    def test_left(self):
        text = "left knee pain for two weeks"
        s = text.index("knee pain")
        lat, _ = adv.laterality(text, "knee pain", s, s + 9)
        assert lat == "left"

    def test_non_anatomical_skipped(self):
        text = "left the hospital with hypertension"
        s = text.index("hypertension")
        assert adv.laterality(text, "hypertension", s, s + 12) == (None, None)


class TestSparkWrapper:
    def test_enhanced_mentions_df(self, spark, ontology_bundle):
        from kgnorm.ontology import broadcast_dictionary

        rows = [
            ("C1", 0, "Patient denies chest pain today."),
            ("C1", 1, "Assessment: heart failure with reduced EF."),
            ("C2", 0, "left knee pain after fall"),
        ]
        df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "text"])
        bc = broadcast_dictionary(spark, ontology_bundle)
        got = adv.enhanced_mentions_df(df, bc, num_partitions=2).collect()
        by_text = {}
        for r in got:
            by_text.setdefault(r.mention_text.lower(), []).append(r)
        if "chest pain" in by_text:
            assert all(r.assertion == "absent" for r in by_text["chest pain"])
        if "heart failure" in by_text:
            hf = by_text["heart failure"][0]
            assert hf.linked_modifier == "with reduced EF (HFrEF)"
        if "knee pain" in by_text:
            assert by_text["knee pain"][0].laterality == "left"
