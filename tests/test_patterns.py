"""Regex pattern extraction pipeline (kgnorm.patterns).

Mirrors reference extraction_pipeline.py behavior: pattern tables with
per-pattern confidence, context modifiers, validator normalization,
keep-max dedup, min-confidence filter; plus the Spark mapInPandas wrapper.
"""

from kgnorm import context as ctx
from kgnorm import patterns


class TestTables:
    def test_table_sizes(self):
        # extraction_pipeline.py:191-438 (verified against the reference
        # source programmatically: 94 / 146 / 48 entries)
        assert len(patterns.CONDITION_PATTERNS) == 94
        assert len(patterns.DRUG_PATTERNS) == 146
        assert len(patterns.MEASUREMENT_PATTERNS) == 48

    def test_reference_confidences(self):
        d = dict(patterns.DRUG_PATTERNS)
        assert d["metformin"] == 0.98
        assert d["alprazolam"] == 0.85
        c = dict(patterns.CONDITION_PATTERNS)
        assert c[r"\b(cap)\b"] == 0.75  # ambiguity-lowered


class TestExtraction:
    def test_condition_with_confidence(self):
        ents = patterns.pipeline_entities("Diagnosis includes atrial fibrillation.")
        afib = [e for e in ents if e.normalized_text == "atrial fibrillation"]
        assert afib and afib[0].base_confidence == 0.95
        assert afib[0].entity_type == "condition"

    def test_drug_word_boundary(self):
        ents = patterns.extract_raw("prescribed aspirin; aspirinX is not a drug")
        spans = [(e.start_offset, e.end_offset) for e in ents if e.entity_type == "drug"]
        assert len(spans) == 1

    def test_measurement_value_captured(self):
        ents = patterns.pipeline_entities("bp: 140/90 today")
        bp = [e for e in ents if e.normalized_text == "blood pressure"]
        assert bp and bp[0].value == "140/90" and bp[0].unit == "mmHg"

    def test_negated_entity_excluded(self):
        ents = patterns.pipeline_entities("Patient denies chest pain.")
        assert not any(e.normalized_text == "chest pain" for e in ents)

    def test_uncertain_entity_dampened(self):
        ents = patterns.pipeline_entities("Assessment: possible pneumonia.")
        pna = [e for e in ents if e.normalized_text == "pneumonia"]
        assert pna and abs(pna[0].final_confidence - 0.92 * 0.7) < 1e-9
        assert pna[0].assertion == ctx.UNCERTAIN

    def test_hypothetical_below_threshold_dropped(self):
        # 0.92 * 0.3 = 0.276 < 0.5 → filtered
        ents = patterns.pipeline_entities("Return if pneumonia develops.")
        assert not any(e.normalized_text == "pneumonia" for e in ents)

    def test_validator_normalizes_abbreviations(self):
        ents = patterns.pipeline_entities("PMH significant for current HTN and CHF.")
        norm = {e.normalized_text for e in ents}
        assert "hypertension" in norm
        assert "heart failure" in norm

    def test_brand_drug_normalized(self):
        ents = patterns.pipeline_entities("Started on Lasix 40mg daily.")
        lasix = [e for e in ents if e.text.lower() == "lasix"]
        assert lasix and lasix[0].normalized_text == "furosemide"

    def test_dedup_keeps_max(self):
        # 'chf' (0.85) and 'heart failure' (0.95) both normalize to
        # 'heart failure' → keep-max on (normalized_text, type)
        ents = patterns.pipeline_entities("Current CHF, now heart failure exacerbation.")
        hf = [e for e in ents if e.normalized_text == "heart failure"]
        assert len(hf) == 1
        assert hf[0].base_confidence == 0.95


class TestSparkWrapper:
    def test_pattern_entities_df(self, spark):
        rows = [
            ("C1", 0, "Assessment: atrial fibrillation. Started metformin 500mg."),
            ("C1", 1, "Patient denies chest pain."),
            ("C2", 0, "bp: 150/95 noted"),
        ]
        df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "text"])
        out = patterns.pattern_entities_df(df, num_partitions=2).collect()
        by_key = {(r.conv_id, r.normalized_text): r for r in out}
        assert ("C1", "atrial fibrillation") in by_key
        assert ("C1", "metformin") in by_key
        assert ("C2", "blood pressure") in by_key
        assert ("C1", "chest pain") not in by_key  # negated
        r = by_key[("C2", "blood pressure")]
        assert r.value == "150/95" and r.unit == "mmHg"
