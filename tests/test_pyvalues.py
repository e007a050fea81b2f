"""Full value extraction port (kgnorm.pyvalues).

Mirrors reference tests/test_value_extraction.py over the ported
patterns, units, routes, frequencies and overlap removal.
"""

from kgnorm import pyvalues as pv


def _only(text, **kw):
    vals = pv.extract_all(text, **kw)
    assert len(vals) >= 1
    return vals[0]


class TestVitals:
    def test_blood_pressure_standard(self):
        v = _only("BP 145/92 mmHg", include_labs=False, include_measurements=False, include_medications=False)
        assert (v.name, v.value, v.value_secondary, v.unit) == ("Blood Pressure", 145.0, 92.0, "mmHg")
        assert v.value_type == pv.VITAL_SIGN
        # reference quirk: the concept table keys 'bp', not the display
        # name 'Blood Pressure' the extractor looks up → None
        # (value_extraction.py:504-507, 542)
        assert v.omop_concept_id is None

    def test_blood_pressure_colon(self):
        v = _only("Blood pressure: 120/80", include_labs=False, include_measurements=False, include_medications=False)
        assert (v.value, v.value_secondary) == (120.0, 80.0)

    def test_standalone_bp_lookbehind(self):
        v = _only("reading of 130/85 mmHg today", include_labs=False, include_measurements=False, include_medications=False)
        assert (v.name, v.value) == ("Blood Pressure", 130.0)

    def test_heart_rate(self):
        v = _only("HR 88 bpm", include_labs=False, include_measurements=False, include_medications=False)
        assert (v.name, v.value, v.unit) == ("Heart Rate", 88.0, "bpm")

    def test_temperature_unit_normalized(self):
        v = _only("Temp 101.2F", include_labs=False, include_measurements=False, include_medications=False)
        assert v.name == "Temperature"
        assert v.unit_normalized == "°F"

    def test_weight_lbs_unit_captured(self):
        v = _only("Wt 154 lbs", include_labs=False, include_measurements=False, include_medications=False)
        assert (v.name, v.value, v.unit) == ("Weight", 154.0, "lbs")

    def test_o2_sat(self):
        v = _only("O2 sat 94%", include_labs=False, include_measurements=False, include_medications=False)
        assert (v.name, v.value) == ("Oxygen Saturation", 94.0)


class TestLabs:
    def test_creatinine_with_unit(self):
        v = _only("Creatinine 1.8 mg/dL", include_vitals=False, include_measurements=False, include_medications=False)
        assert (v.name.lower(), v.value) == ("creatinine", 1.8)
        assert v.unit_normalized == "mg/dL"
        assert v.omop_concept_id == 3016723

    def test_hba1c(self):
        v = _only("A1c 7.2%", include_vitals=False, include_measurements=False, include_medications=False)
        assert v.value == 7.2
        assert v.omop_concept_id == 3004410

    def test_potassium_concept(self):
        v = _only("Potassium 4.2 mmol/L", include_vitals=False, include_measurements=False, include_medications=False)
        assert v.omop_concept_id == 3023103
        assert v.unit_normalized == "mmol/L"


class TestMeasurementsAndMeds:
    def test_ejection_fraction(self):
        v = _only("Echo shows LVEF 40%", include_vitals=False, include_labs=False, include_medications=False)
        assert (v.name, v.value, v.unit) == ("Ejection Fraction", 40.0, "%")
        assert v.omop_concept_id == 3027694

    def test_metformin_dose_route_freq(self):
        v = _only("Metformin 1000mg PO BID", include_vitals=False, include_labs=False, include_measurements=False)
        assert (v.name, v.value, v.unit) == ("Metformin", 1000.0, "mg")
        assert v.route == "oral"
        assert v.frequency == "twice daily"

    def test_q_n_hours_substitution(self):
        assert pv.extract_frequency("q6h") == "every 6 hours"

    def test_insulin_units(self):
        v = _only("Lantus 40 units at bedtime", include_vitals=False, include_labs=False, include_measurements=False)
        assert v.value == 40.0
        assert "unit" in v.unit.lower()
        # reference quirk: FREQUENCY_PATTERNS has no literal 'at bedtime'
        # key (only qhs/hs map TO it), so the canonical form itself does
        # not re-canonicalize (value_extraction.py:223-247, 490-499)
        assert v.frequency is None
        assert pv.extract_frequency("qhs") == "at bedtime"

    def test_multiple_meds(self):
        vals = pv.extract_all(
            "Metoprolol 25mg BID, Furosemide 40mg daily, Lisinopril 10mg daily",
            include_vitals=False, include_labs=False, include_measurements=False,
        )
        names = {v.name for v in vals}
        assert {"Metoprolol", "Furosemide", "Lisinopril"} <= names


class TestUnitsAndOverlap:
    def test_unit_normalization_table(self):
        assert pv.normalize_unit("MG/DL") == "mg/dL"
        assert pv.normalize_unit("x10^3/ul") == "K/uL"
        assert pv.normalize_unit("fahrenheit") == "°F"
        assert pv.normalize_unit("unknown-unit") == "unknown-unit"  # identity
        assert pv.normalize_unit(None) is None

    def test_overlap_keeps_longer(self):
        # the generic lab pattern and HbA1c-specific pattern both match;
        # overlap removal keeps one value
        vals = pv.extract_all("HbA1c 8.2%", include_vitals=False, include_measurements=False, include_medications=False)
        assert len(vals) == 1

    def test_offsets_index_into_text(self):
        text = "Labs: glucose 186 mg/dl stable."
        vals = pv.extract_all(text, include_vitals=False, include_measurements=False, include_medications=False)
        for v in vals:
            assert text[v.start_offset:v.end_offset] == v.text
