"""Scope-based clinical context analysis (kgnorm.context).

Mirrors the behaviors of reference clinical_context.py:102-853 —
NegEx scopes, section detection, historical/family triggers, combined
assertion + confidence-modifier logic (incl. preserved quirks).
"""

from kgnorm import context as ctx


def _ctx(text, needle):
    start = text.lower().index(needle.lower())
    sections, scopes = ctx.analyze_text(text)
    return ctx.analyze_mention(text, start, start + len(needle), sections, scopes)


class TestNegation:
    def test_pre_negation(self):
        c = _ctx("Patient denies chest pain today.", "chest pain")
        assert c.assertion == ctx.ABSENT
        assert c.is_negated
        assert c.confidence_modifier == 0.0

    def test_no_evidence_of(self):
        c = _ctx("There is no evidence of pneumonia.", "pneumonia")
        assert c.assertion == ctx.ABSENT

    def test_scope_terminator_ends_negation(self):
        # 'but' terminates the scope before the mention
        c = _ctx("No fever but cough persists and remains productive.", "cough")
        assert c.assertion == ctx.PRESENT

    def test_post_negation(self):
        c = _ctx("Pulmonary embolism was ruled out.", "Pulmonary embolism")
        assert c.assertion == ctx.ABSENT

    def test_uncertainty(self):
        c = _ctx("Findings possible pneumonia in the right lobe.", "pneumonia")
        assert c.assertion == ctx.UNCERTAIN
        assert c.confidence_modifier == 0.7

    def test_hypothetical(self):
        c = _ctx("Return if fever develops overnight.", "fever")
        assert c.assertion == ctx.HYPOTHETICAL
        assert c.confidence_modifier == 0.3

    def test_scope_limited_to_50_chars(self):
        filler = "x" * 60
        text = f"no {filler} hypertension"
        c = _ctx(text, "hypertension")
        assert c.assertion == ctx.PRESENT

    def test_trigger_adjacency_slack(self):
        # trigger_end <= mention_start <= trigger_end + 5 fallback
        # (clinical_context.py:360-361)
        text = "not: fever"
        sections, scopes = ctx.analyze_text(text)
        assertion, trig = ctx.get_assertion(scopes, 5, 10)
        assert assertion == ctx.ABSENT

    def test_runlikely_quirk_preserved(self):
        # the reference post-negation list contains 'runlikely', not
        # 'unlikely' (clinical_context.py:162)
        scopes = ctx.find_scopes("PE runlikely")
        assert any(s.trigger == "runlikely" for s in scopes)
        assert not any(s.trigger == "unlikely" for s in ctx.find_scopes("PE unlikely"))


class TestSections:
    def test_detect_and_resolve(self):
        text = "Chief complaint: chest pain. Medications: aspirin. Plan: follow-up."
        sections = ctx.detect_sections(text)
        assert sections[0].section == ctx.SEC_CHIEF_COMPLAINT
        assert ctx.section_at(sections, text.index("chest pain")) == ctx.SEC_CHIEF_COMPLAINT
        assert ctx.section_at(sections, text.index("aspirin")) == ctx.SEC_MEDICATIONS

    def test_unknown_before_first_header(self):
        text = "Free text preamble. Assessment: stable."
        sections = ctx.detect_sections(text)
        assert ctx.section_at(sections, 0) == ctx.SEC_UNKNOWN

    def test_family_history_section_zeroes_modifier(self):
        text = "Family history: mother with diabetes mellitus."
        c = _ctx(text, "diabetes mellitus")
        assert c.assertion == ctx.FAMILY
        assert c.confidence_modifier == 0.0
        assert c.is_family_history


class TestHistoricalAndFamily:
    def test_history_of(self):
        c = _ctx("Notable history of stroke in the past.", "stroke")
        assert c.assertion == ctx.HISTORICAL
        assert c.confidence_modifier == 0.8

    def test_current_trigger_blocks_historical(self):
        # 'acute' is a current trigger; no historical trigger in window
        c = _ctx("Presents with acute stroke symptoms.", "stroke")
        assert c.assertion == ctx.PRESENT

    def test_family_trigger_near_mention(self):
        c = _ctx("Her mother had breast cancer years ago.", "breast cancer")
        assert c.assertion == ctx.FAMILY
        assert c.confidence_modifier == 0.0

    def test_historical_does_not_override_negation(self):
        # ABSENT assertion wins over historical (analyze_mention order)
        c = _ctx("No history of seizures reported.", "seizures")
        assert c.assertion == ctx.ABSENT
