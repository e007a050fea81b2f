"""Synonym expansion set-union for the enhanced vocabulary.

Port of ``backend/app/services/vocabulary_enhanced.py``:
``SYNONYM_PATTERNS`` (:32-53), ``ABBREVIATION_EXPANSIONS`` (:56-140) and
``_expand_synonyms`` (:278-295).  Tables are reference data ported
verbatim.

Expansion happens at DICTIONARY-BUILD time (driver-side, ontology-
bounded) — the expanded entries then travel inside the same broadcast
the extraction automaton uses, so the distributed plan is unchanged:
the only cost is a larger broadcast (+|expansions| entries).
"""

from __future__ import annotations

# spelling variations + abbreviation patterns (vocabulary_enhanced.py:32-53)
SYNONYM_PATTERNS: dict[str, list[str]] = {
    "emia": ["emia", "aemia"],
    "edema": ["edema", "oedema"],
    "fiber": ["fiber", "fibre"],
    "tumor": ["tumor", "tumour"],
    "anemia": ["anemia", "anaemia"],
    "leukemia": ["leukemia", "leukaemia"],
    "esophagus": ["esophagus", "oesophagus"],
    "estrogen": ["estrogen", "oestrogen"],
    "fetus": ["fetus", "foetus"],
    "hemoglobin": ["hemoglobin", "haemoglobin"],
    "hemorrhage": ["hemorrhage", "haemorrhage"],
    "disease": ["disease", "dis", "disorder"],
    "syndrome": ["syndrome", "synd"],
    "acute": ["acute", "a.", "ac."],
    "chronic": ["chronic", "chr", "c."],
    "bilateral": ["bilateral", "b/l", "bil"],
    "unilateral": ["unilateral", "u/l", "uni"],
}

# clinical abbreviations → expansions (vocabulary_enhanced.py:56-140)
ABBREVIATION_EXPANSIONS: dict[str, list[str]] = {
    # conditions
    "htn": ["hypertension", "high blood pressure"],
    "dm": ["diabetes mellitus", "diabetes", "type 2 diabetes"],
    "dm2": ["type 2 diabetes mellitus", "type 2 diabetes", "t2dm"],
    "dm1": ["type 1 diabetes mellitus", "type 1 diabetes", "t1dm"],
    "cad": ["coronary artery disease", "coronary heart disease"],
    "chf": ["congestive heart failure", "heart failure"],
    "afib": ["atrial fibrillation", "a-fib", "af"],
    "copd": ["chronic obstructive pulmonary disease"],
    "ckd": ["chronic kidney disease", "chronic renal disease"],
    "aki": ["acute kidney injury", "acute renal failure"],
    "uti": ["urinary tract infection", "bladder infection"],
    "cva": ["cerebrovascular accident", "stroke"],
    "tia": ["transient ischemic attack", "mini stroke"],
    "mi": ["myocardial infarction", "heart attack"],
    "pe": ["pulmonary embolism", "lung clot"],
    "dvt": ["deep vein thrombosis", "leg clot"],
    "gerd": ["gastroesophageal reflux disease", "acid reflux"],
    "ibs": ["irritable bowel syndrome", "spastic colon"],
    "ra": ["rheumatoid arthritis", "rheumatoid disease"],
    "oa": ["osteoarthritis", "degenerative joint disease"],
    "bph": ["benign prostatic hyperplasia", "enlarged prostate"],
    "osa": ["obstructive sleep apnea", "sleep apnea"],
    # drugs
    "asa": ["aspirin", "acetylsalicylic acid"],
    "apap": ["acetaminophen", "tylenol", "paracetamol"],
    "hctz": ["hydrochlorothiazide", "water pill"],
    "ppi": ["proton pump inhibitor", "acid reducer"],
    "ssri": ["selective serotonin reuptake inhibitor", "antidepressant"],
    "snri": ["serotonin-norepinephrine reuptake inhibitor"],
    "nsaid": ["nonsteroidal anti-inflammatory drug", "anti-inflammatory"],
    "ace": ["angiotensin converting enzyme inhibitor", "ace inhibitor"],
    "arb": ["angiotensin receptor blocker"],
    "ccb": ["calcium channel blocker"],
    "bb": ["beta blocker", "beta-blocker"],
    # labs / measurements
    "bp": ["blood pressure"],
    "hr": ["heart rate", "pulse"],
    "rr": ["respiratory rate", "respirations"],
    "spo2": ["oxygen saturation", "o2 sat"],
    "bmi": ["body mass index"],
    "bmp": ["basic metabolic panel"],
    "cmp": ["comprehensive metabolic panel"],
    "cbc": ["complete blood count"],
    "wbc": ["white blood cell count", "white count"],
    "hgb": ["hemoglobin"],
    "hct": ["hematocrit"],
    "plt": ["platelet count", "platelets"],
    "bun": ["blood urea nitrogen"],
    "cr": ["creatinine", "serum creatinine"],
    "gfr": ["glomerular filtration rate"],
    "alt": ["alanine aminotransferase", "sgpt"],
    "ast": ["aspartate aminotransferase", "sgot"],
    "alp": ["alkaline phosphatase"],
    "inr": ["international normalized ratio"],
    "pt": ["prothrombin time"],
    "ptt": ["partial thromboplastin time"],
    "bnp": ["b-type natriuretic peptide"],
    "tsh": ["thyroid stimulating hormone"],
    "hba1c": ["hemoglobin a1c", "glycated hemoglobin", "a1c"],
    "ldl": ["ldl cholesterol", "bad cholesterol"],
    "hdl": ["hdl cholesterol", "good cholesterol"],
    "tg": ["triglycerides"],
    "crp": ["c-reactive protein"],
    "esr": ["erythrocyte sedimentation rate", "sed rate"],
    # procedures
    "ekg": ["electrocardiogram", "ecg", "12-lead ecg"],
    "echo": ["echocardiogram", "cardiac ultrasound"],
    "cxr": ["chest x-ray", "chest radiograph"],
    "ct": ["computed tomography", "cat scan"],
    "mri": ["magnetic resonance imaging"],
    "us": ["ultrasound", "sonogram"],
    "egd": ["esophagogastroduodenoscopy", "upper endoscopy"],
    "ercp": ["endoscopic retrograde cholangiopancreatography"],
    "pft": ["pulmonary function test", "spirometry"],
    "cabg": ["coronary artery bypass graft", "bypass surgery"],
    "pci": ["percutaneous coronary intervention", "angioplasty"],
    "lp": ["lumbar puncture", "spinal tap"],
    "cvc": ["central venous catheter", "central line"],
}


def expand_synonyms(synonyms: list[str]) -> list[str]:
    """Set-union expansion (vocabulary_enhanced.py:278-295): abbreviation
    expansions + spelling-variation substitutions.  Returns a list whose
    ORDER is normalized (sorted) for reproducible dictionary builds — the
    reference returns ``list(set(...))`` with hash-order nondeterminism."""
    expanded = set(synonyms)
    for synonym in synonyms:
        lower = synonym.lower()
        if lower in ABBREVIATION_EXPANSIONS:
            expanded.update(ABBREVIATION_EXPANSIONS[lower])
        for pattern, variations in SYNONYM_PATTERNS.items():
            if pattern in lower:
                for var in variations:
                    expanded.add(lower.replace(pattern, var))
    return sorted(expanded)
