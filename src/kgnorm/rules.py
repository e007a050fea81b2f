"""Pure-Python rule semantics for clinical mention extraction.

Everything in this module is a deterministic per-string function with NO
Spark dependency: it runs inside Arrow-batched ``mapInPandas`` workers
(:mod:`kgnorm.extract`), in unit tests, and in the driver-side oracle
generator.  The semantics reproduce the reference engine's *job path*
(backend/app/jobs/document_processing.py:92 →
backend/app/services/nlp_rule_based.py) exactly — including its quirks —
because emitted-triple parity (P/R ≥ 0.95) depends on them:

* Aho-Corasick scan over all lowercased dictionary synonyms; overlapping
  and nested matches are all kept (nlp_rule_based.py:309-337);
* word-boundary post-filter: previous/next char must not be alnum or
  ``_`` (nlp_rule_based.py:384-410);
* first-wins span dedup, stopword and min-length filters
  (nlp_rule_based.py:329-337, stoplist :62-85);
* assertion from the 50-char *preceding* window, closest trigger wins,
  tie priority uncertainty > positive > negation
  (nlp_rule_based.py:456-502);
* temporality / experiencer from the ±50-char surrounding window
  (nlp_rule_based.py:504-536);
* section parsing with 30+ header regexes, last-header-wins lookup
  (section_parser.py:83-156, 300-316) and the section-domain affinity →
  confidence modifier tables (section_parser.py:160-248, 338-362);
* the exact confidence formula (nlp_rule_based.py:538-612);
* preserved quirks: the ``\\brunlikely\\b`` typo trigger
  (nlp_rule_based.py:148), ``\\bon\\b`` as a positive trigger (:123),
  ``\\blikely\\b`` as uncertainty (:164).
"""

from __future__ import annotations

import re
from typing import Any, NamedTuple

# --------------------------------------------------------------------------
# Closed string domains (reference: backend/app/schemas/base.py:6-40)
# --------------------------------------------------------------------------

PRESENT, ABSENT, POSSIBLE = "present", "absent", "possible"
CURRENT, PAST, FUTURE = "current", "past", "future"
PATIENT, FAMILY, OTHER = "patient", "family", "other"

# --------------------------------------------------------------------------
# Stoplist / length floor (nlp_rule_based.py:62-88)
# --------------------------------------------------------------------------

STOPWORDS = frozenset({
    "a", "an", "the", "is", "are", "was", "were", "be", "been",
    "or", "and", "but", "if", "then", "so", "as", "at", "by", "for",
    "from", "in", "into", "of", "on", "to", "with", "without",
    "yes", "no", "not", "can", "will", "may", "has", "had", "have",
    "all", "any", "some", "one", "two", "per", "mg", "ml",
    "air", "water", "normal", "stable", "pain", "use", "day", "time",
    "room", "well", "new", "old", "left", "right", "patient",
})

MIN_TERM_LENGTH = 2

# --------------------------------------------------------------------------
# Context trigger lexicons (nlp_rule_based.py:115-193)
# Each category is scanned pattern-by-pattern with finditer and the
# maximum match-end wins, exactly like the reference's closest-trigger
# logic; do NOT collapse a category into one alternation (alternation is
# leftmost-first and can report a shorter end for nested triggers like
# "no" inside "no evidence of").
# --------------------------------------------------------------------------

POSITIVE_TRIGGERS = [
    r"\btaking\b", r"\btakes\b", r"\bon\b", r"\breceiving\b", r"\breceives\b",
    r"\bprescribed\b", r"\bstarted\s+(?:on\s+)?", r"\bcontinue\b",
    r"\bcontinued\b", r"\bcontinuing\b", r"\busing\b", r"\bhas\b", r"\bwith\b",
    r"\bdiagnosed\s+with\b", r"\bpresents?\s+with\b", r"\bcomplaining\s+of\b",
    r"\breports?\b",
]

NEGATION_TRIGGERS = [
    r"\bno\b", r"\bnot\b", r"\bdenies\b", r"\bdenied\b", r"\bwithout\b",
    r"\babsence\s+of\b", r"\bnegative\s+for\b", r"\bruled\s+out\b",
    r"\brunlikely\b",  # reference typo, preserved for parity
    r"\bno\s+evidence\s+of\b",
]

UNCERTAINTY_TRIGGERS = [
    r"\bcannot\s+rule\s+out\b", r"\bcan\'?t\s+rule\s+out\b", r"\bpossible\b",
    r"\bprobable\b", r"\bsuspected?\b", r"\bquestionable\b", r"\bmay\s+have\b",
    r"\bmight\s+have\b", r"\bcould\s+be\b", r"\bappears?\s+to\s+be\b",
    r"\blikely\b", r"\bconcern\s+for\b", r"\brule\s+out\b",
]

PAST_TRIGGERS = [
    r"\bhistory\s+of\b", r"\bpast\s+history\s+of\b", r"\bprior\b",
    r"\bprevious\b", r"\bformer\b", r"\bhad\b",
    r"\bwas\s+diagnosed\s+with\b", r"\bremote\b",
]

FAMILY_TRIGGERS = [
    r"\bfamily\s+history\b", r"\bfamily\s+hx\b", r"\bfhx\b",
    r"\bmother\s+(?:has|had|with|diagnosed)\b",
    r"\bfather\s+(?:has|had|with|diagnosed)\b",
    r"\bsibling\s+(?:has|had|with|diagnosed)\b",
    r"\bbrother\s+(?:has|had|with|diagnosed)\b",
    r"\bsister\s+(?:has|had|with|diagnosed)\b",
    r"\bparent\s+(?:has|had|with|diagnosed)\b",
]

_FLAGS = re.IGNORECASE
_POS_RX = [re.compile(p, _FLAGS) for p in POSITIVE_TRIGGERS]
_NEG_RX = [re.compile(p, _FLAGS) for p in NEGATION_TRIGGERS]
_UNC_RX = [re.compile(p, _FLAGS) for p in UNCERTAINTY_TRIGGERS]
_PAST_RX = [re.compile(p, _FLAGS) for p in PAST_TRIGGERS]
_FAM_RX = [re.compile(p, _FLAGS) for p in FAMILY_TRIGGERS]


def _lookahead_union(patterns: list[str]) -> re.Pattern:
    """Single-pass scanner equivalent to per-pattern ``finditer`` max-end.

    A plain alternation is leftmost-first and CONSUMES text, so it can
    report a shorter end for nested triggers ("no" inside "no evidence
    of") or miss matches inside a consumed span.  Wrapping the union in a
    zero-width lookahead ``(?=(A|B|...))`` visits EVERY start position,
    and sorting alternatives longest-pattern-first makes the captured
    alternative the longest match at that position — so
    ``max(start + len(capture))`` equals the reference's per-pattern
    max-end.  Equivalence is asserted against the naive loop in
    tests/test_rules.py::test_fast_trigger_scan_equivalence.
    """
    ordered = sorted(patterns, key=len, reverse=True)
    return re.compile(r"(?=(" + "|".join(ordered) + r"))", _FLAGS)


_POS_FAST = None
_NEG_FAST = None
_UNC_FAST = None
_PAST_ANY = None
_FAM_ANY = None


def _compile_fast() -> None:
    global _POS_FAST, _NEG_FAST, _UNC_FAST, _PAST_ANY, _FAM_ANY
    _POS_FAST = _lookahead_union(POSITIVE_TRIGGERS)
    _NEG_FAST = _lookahead_union(NEGATION_TRIGGERS)
    _UNC_FAST = _lookahead_union(UNCERTAINTY_TRIGGERS)
    # presence-only categories: a plain (consuming) union has identical
    # any-match semantics to the reference's per-pattern search loop
    _PAST_ANY = re.compile("|".join(PAST_TRIGGERS), _FLAGS)
    _FAM_ANY = re.compile("|".join(FAMILY_TRIGGERS), _FLAGS)


_compile_fast()

# Literal prescreens: each is a NECESSARY substring for some trigger in its
# category (every regex match contains one of these stems), so a failed
# prescreen proves no trigger matches — the regex scan is skipped.  C-level
# substring search is ~10× cheaper than the union regex on a window.
_NEG_STEMS = ("no", "denie", "without", "absence", "negative", "ruled", "runlikely")
_UNC_STEMS = ("rule", "possib", "probab", "suspect", "question", "may", "might",
              "could", "appear", "likely", "concern", "can")
_PAST_STEMS = ("histor", "prior", "previous", "former", "had", "diagnosed", "remote")
_FAM_STEMS = ("family", "fhx", "mother", "father", "sibling", "brother", "sister", "parent")


def _has_stem(context: str, stems: tuple) -> bool:
    for s in stems:
        if s in context:
            return True
    return False


CONTEXT_WINDOW = 50  # chars (nlp_rule_based.py:417, :439)


def _max_end(patterns: list[re.Pattern], context: str) -> int:
    """Largest match end across patterns, -1 if none (nlp_rule_based.py:474-481).

    Reference-shaped naive loop; kept as the parity baseline for the
    fast scanner (see _lookahead_union)."""
    best = -1
    for rx in patterns:
        for m in rx.finditer(context):
            if m.end() > best:
                best = m.end()
    return best


def _max_end_fast(rx: re.Pattern, context: str) -> int:
    best = -1
    for m in rx.finditer(context):
        end = m.start() + len(m.group(1))
        if end > best:
            best = end
    return best


def detect_assertion(preceding: str) -> str:
    """Closest-trigger-wins assertion over the preceding window.

    Tie priority: uncertainty > positive > negation
    (nlp_rule_based.py:456-502).

    Short-circuit: when neither an uncertainty nor a negation trigger is
    present the answer is PRESENT regardless of positive triggers (they
    only matter to OUTRANK a negation/uncertainty match), so the
    positive scan — the most common and most expensive category — is
    skipped.  Exact-equivalence with the reference-shaped full
    evaluation is asserted in tests.
    """
    unc = _max_end_fast(_UNC_FAST, preceding) if _has_stem(preceding, _UNC_STEMS) else -1
    neg = _max_end_fast(_NEG_FAST, preceding) if _has_stem(preceding, _NEG_STEMS) else -1
    if unc == -1 and neg == -1:
        return PRESENT
    pos = _max_end_fast(_POS_FAST, preceding)
    top = max(unc, pos, neg)
    if unc == top:
        return POSSIBLE
    if pos == top:
        return PRESENT
    return ABSENT


def detect_assertion_naive(preceding: str) -> str:
    """Per-pattern-loop twin of detect_assertion (parity/testing only)."""
    unc = _max_end(_UNC_RX, preceding)
    pos = _max_end(_POS_RX, preceding)
    neg = _max_end(_NEG_RX, preceding)
    if unc == -1 and pos == -1 and neg == -1:
        return PRESENT
    top = max(unc, pos, neg)
    if unc == top:
        return POSSIBLE
    if pos == top:
        return PRESENT
    return ABSENT


def detect_temporality(surrounding: str) -> str:
    """Any past trigger in the ±window → past (nlp_rule_based.py:504-519)."""
    if not _has_stem(surrounding, _PAST_STEMS):
        return CURRENT
    return PAST if _PAST_ANY.search(surrounding) else CURRENT


def detect_experiencer(surrounding: str) -> str:
    """Any family trigger in the ±window → family (nlp_rule_based.py:521-536)."""
    if not _has_stem(surrounding, _FAM_STEMS):
        return PATIENT
    return FAMILY if _FAM_ANY.search(surrounding) else PATIENT


# --------------------------------------------------------------------------
# Section parsing (section_parser.py)
# Sections are plain strings here; UNKNOWN is the absent-section marker.
# --------------------------------------------------------------------------

UNKNOWN_SECTION = "Unknown"

# (header_regex, canonical_section) — order preserved from
# section_parser.py:83-156 (first pattern registering a start offset wins).
SECTION_PATTERNS: list[tuple[str, str]] = [
    (r"\b(?:CHIEF\s+COMPLAINT|CC|C/C|REASON\s+FOR\s+(?:VISIT|ADMISSION))\s*:", "Chief Complaint"),
    (r"\b(?:HISTORY\s+OF\s+(?:THE\s+)?PRESENT(?:ING)?\s+ILLNESS|HPI|H\.P\.I\.)\s*:", "History of Present Illness"),
    (r"\b(?:PAST\s+MEDICAL\s+HISTORY|PMHx?|P\.M\.H\.|MEDICAL\s+HISTORY)\s*:", "Past Medical History"),
    (r"\b(?:PAST\s+SURGICAL\s+HISTORY|PSHx?|SURGICAL\s+HISTORY)\s*:", "Past Surgical History"),
    (r"\b(?:FAMILY\s+HISTORY|FHx?|F\.H\.)\s*:", "Family History"),
    (r"\b(?:SOCIAL\s+HISTORY|SHx|S\.H\.)\s*:", "Social History"),
    (r"\b(?:REVIEW\s+OF\s+SYSTEMS|ROS|R\.O\.S\.)\s*:", "Review of Systems"),
    (r"\b(?:ALLERGIES|DRUG\s+ALLERGIES|KNOWN\s+ALLERGIES)\s*:", "Allergies"),
    (r"\b(?:DISCHARGE\s+MEDICATIONS?|D/C\s+MEDS?)\s*:", "Discharge Medications"),
    (r"\b(?:HOME\s+MEDICATIONS?|OUTPATIENT\s+MEDICATIONS?)\s*:", "Home Medications"),
    (r"\b(?:MEDICATIONS?|CURRENT\s+MEDICATIONS?)\s*:", "Medications"),
    (r"\b(?:VITAL\s+SIGNS?|VITALS?)\s*:", "Vital Signs"),
    (r"\b(?:PHYSICAL\s+EXAM(?:INATION)?|P\.E\.)\s*:", "Physical Exam"),
    (r"\b(?:LAB(?:ORATORY)?\s*(?:RESULTS?|DATA|VALUES?)?|LABS)\s*:", "Labs"),
    (r"\b(?:IMAGING|RADIOLOGY)\s*:", "Imaging"),
    (r"\b(?:EKG|ECG|ELECTROCARDIOGRAM)\s*:", "EKG"),
    (r"\b(?:STUDIES|DIAGNOSTIC\s+STUDIES)\s*:", "Studies"),
    (r"\b(?:ASSESSMENT\s*(?:AND|&|/)\s*PLAN|A\s*/\s*P)\s*:", "Assessment and Plan"),
    (r"\b(?:ASSESSMENT|IMPRESSION|CLINICAL\s+IMPRESSION)\s*:", "Assessment"),
    (r"\b(?:PLAN|TREATMENT\s+PLAN|MANAGEMENT)\s*:", "Plan"),
    (r"\b(?:DIAGNOSIS|DIAGNOSES|PROBLEM\s+LIST)\s*:", "Diagnosis"),
    (r"\b(?:DISCHARGE\s+DIAGNOSIS|DISCHARGE\s+DX|FINAL\s+DIAGNOSIS)\s*:", "Discharge Diagnosis"),
    (r"\b(?:ADMISSION\s+DIAGNOSIS|ADMITTING\s+DIAGNOSIS)\s*:", "Diagnosis"),
    (r"\b(?:HOSPITAL\s+COURSE|CLINICAL\s+COURSE)\s*:", "Hospital Course"),
    (r"\b(?:PROCEDURES?|OPERATIONS?|INTERVENTIONS?)\s*:", "Procedures"),
    (r"\b(?:FOLLOW[\s-]?UP|F/U|DISPOSITION)\s*:", "Follow-up"),
    (r"\b(?:DISCHARGE\s+INSTRUCTIONS?|PATIENT\s+INSTRUCTIONS?)\s*:", "Discharge Instructions"),
]

_SECTION_RX = [(re.compile(p, re.IGNORECASE | re.MULTILINE), s) for p, s in SECTION_PATTERNS]
# presence prefilter: if the union of all header patterns has no match,
# none of the 27 per-pattern scans can (texts without section headers —
# the common case for conversation turns — skip the whole loop)
_SECTION_ANY = re.compile("|".join(p for p, _ in SECTION_PATTERNS), re.IGNORECASE | re.MULTILINE)

# section → {domain → affinity}  (section_parser.py:160-248)
SECTION_DOMAIN_AFFINITY: dict[str, dict[str, float]] = {
    "Chief Complaint": {"Condition": 0.9, "Observation": 0.8},
    "History of Present Illness": {"Condition": 0.9, "Observation": 0.7, "Drug": 0.5},
    "Past Medical History": {"Condition": 1.0, "Procedure": 0.6},
    "Past Surgical History": {"Procedure": 1.0, "Condition": 0.4},
    "Family History": {"Condition": 1.0},
    "Social History": {"Observation": 0.8, "Condition": 0.5},
    "Allergies": {"Drug": 1.0, "Observation": 0.6},
    "Medications": {"Drug": 1.0},
    "Home Medications": {"Drug": 1.0},
    "Discharge Medications": {"Drug": 1.0},
    "Vital Signs": {"Measurement": 1.0, "Observation": 0.7},
    "Physical Exam": {"Observation": 1.0, "Condition": 0.6, "Measurement": 0.5},
    "Labs": {"Measurement": 1.0},
    "Imaging": {"Procedure": 0.8, "Observation": 0.7, "Condition": 0.5},
    "EKG": {"Procedure": 0.7, "Observation": 0.8, "Condition": 0.5},
    "Assessment": {"Condition": 1.0, "Observation": 0.6},
    "Assessment and Plan": {"Condition": 0.9, "Drug": 0.7, "Procedure": 0.6},
    "Plan": {"Drug": 0.9, "Procedure": 0.8, "Condition": 0.5},
    "Diagnosis": {"Condition": 1.0},
    "Discharge Diagnosis": {"Condition": 1.0},
    "Hospital Course": {"Condition": 0.8, "Drug": 0.7, "Procedure": 0.7},
    "Procedures": {"Procedure": 1.0},
}


def parse_sections(text: str) -> list[tuple[str, int, int]]:
    """Return ordered ``(section, start, end)`` spans (section_parser.py:263-298).

    First pattern to claim a start offset wins; each span ends where the
    next begins; the last span runs to end-of-text.
    """
    # every header pattern requires a ':' after the header (section_parser.py
    # pattern table) — a text with no colon cannot contain a section header
    if ":" not in text or not _SECTION_ANY.search(text):
        return []
    found: dict[int, str] = {}
    for rx, section in _SECTION_RX:
        for m in rx.finditer(text):
            if m.start() not in found:
                found[m.start()] = section
    starts = sorted(found)
    spans = []
    for i, s in enumerate(starts):
        e = starts[i + 1] if i + 1 < len(starts) else len(text)
        spans.append((found[s], s, e))
    return spans


def section_at(spans: list[tuple[str, int, int]], offset: int) -> str:
    """Most recent header at/before offset (nlp_rule_based.py:300-307)."""
    for section, start, _end in reversed(spans):
        if start <= offset:
            return section
    return UNKNOWN_SECTION


def domain_affinity(section: str, domain: str) -> float:
    """section_parser.py:318-336 — 0.5 neutral for unmapped sections, 0.3 default."""
    if section not in SECTION_DOMAIN_AFFINITY:
        return 0.5
    return SECTION_DOMAIN_AFFINITY[section].get(domain, 0.3)


def confidence_modifier(section: str, domain: str) -> float:
    """Affinity → modifier in [0.8, 1.1] (section_parser.py:338-362)."""
    affinity = domain_affinity(section, domain)
    if affinity >= 0.8:
        return 1.0 + (affinity - 0.8) * 0.5
    if affinity >= 0.4:
        return 0.95 + (affinity - 0.4) * 0.125
    return 0.8 + affinity * 0.5


# --------------------------------------------------------------------------
# Confidence scoring (nlp_rule_based.py:92-98, 538-612)
# --------------------------------------------------------------------------

_W_BASE, _W_LEN, _W_SECTION, _W_SPEC, _W_CASE = 0.4, 0.2, 0.2, 0.1, 0.1


def confidence_score(
    matched_text: str,
    lexical_variant: str,
    concept_id: int | None,
    domain_id: str | None,
    section: str,
    assertion: str,
) -> float:
    score = _W_BASE * 1.0
    n = len(matched_text)
    if n >= 10:
        length_score = 1.0
    elif n >= 5:
        length_score = 0.6 + (n - 5) * 0.08
    else:
        length_score = 0.3 + (n - 2) * 0.1
    score += _W_LEN * length_score
    modifier = confidence_modifier(section, domain_id or "Observation")
    section_score = min(1.0, max(0.0, (modifier - 0.8) / 0.3))
    score += _W_SECTION * section_score
    score += _W_SPEC * (1.0 if concept_id is not None else 0.5)
    if matched_text == lexical_variant:
        case_score = 1.0
    elif matched_text.lower() == lexical_variant.lower():
        case_score = 0.8
    else:
        case_score = 0.5
    score += _W_CASE * case_score
    if assertion == POSSIBLE:
        score *= 0.9
    return max(0.0, min(1.0, score))


# --------------------------------------------------------------------------
# Mention extraction (nlp_rule_based.py:268-410)
# --------------------------------------------------------------------------


class Mention(NamedTuple):
    text: str
    start_offset: int
    end_offset: int
    lexical_variant: str
    section: str | None
    assertion: str
    temporality: str
    experiencer: str
    confidence: float
    domain_hint: str | None
    omop_concept_id: int | None


def is_word_boundary(text: str, start: int, end: int) -> bool:
    """Reject matches flanked by alnum/underscore (nlp_rule_based.py:384-410)."""
    if start > 0:
        prev = text[start - 1]
        if prev.isalnum() or prev == "_":
            return False
    if end < len(text):
        nxt = text[end]
        if nxt.isalnum() or nxt == "_":
            return False
    return True


def extract_mentions(text: str, automaton: Any) -> list[Mention]:
    """Dictionary-scan a single text into ordered mentions.

    ``automaton`` payloads are ``(synonym, domain_id, concept_id)`` tuples
    exactly as the reference stores them (nlp_rule_based.py:258-260).
    Returns mentions sorted by start offset (stable, like the reference's
    final ``sort(key=start_offset)`` at :379-381).
    """
    mentions: list[Mention] = []
    seen_spans: set[tuple[int, int]] = set()
    spans = parse_sections(text)
    lower = text.lower()

    for end_index, (lexical_variant, domain_id, concept_id) in automaton.iter(lower):
        start = end_index - len(lexical_variant) + 1
        end = end_index + 1
        matched = text[start:end]
        if not is_word_boundary(text, start, end):
            continue
        if (start, end) in seen_spans:
            continue
        if matched.lower() in STOPWORDS:
            continue
        if len(matched) < MIN_TERM_LENGTH:
            continue
        seen_spans.add((start, end))

        preceding = text[max(0, start - CONTEXT_WINDOW):start].lower()
        surrounding = text[max(0, start - CONTEXT_WINDOW):min(len(text), end + CONTEXT_WINDOW)].lower()
        assertion = detect_assertion(preceding)
        temporality = detect_temporality(surrounding)
        experiencer = detect_experiencer(surrounding)
        section = section_at(spans, start)
        mentions.append(Mention(
            text=matched,
            start_offset=start,
            end_offset=end,
            lexical_variant=lexical_variant,
            section=None if section == UNKNOWN_SECTION else section,
            assertion=assertion,
            temporality=temporality,
            experiencer=experiencer,
            confidence=confidence_score(matched, lexical_variant, concept_id, domain_id, section, assertion),
            domain_hint=domain_id,
            omop_concept_id=concept_id,
        ))

    mentions.sort(key=lambda m: m.start_offset)
    return mentions


# --------------------------------------------------------------------------
# Text normalization + token-set similarity for fuzzy linking
# (mapping.py:128-175)
# --------------------------------------------------------------------------

_WS_RX = re.compile(r"\s+")
_EDGE_PUNCT_RX = re.compile(r"^[^\w]+|[^\w]+$")


def normalize_text(text: str) -> str:
    """lowercase, collapse whitespace, strip edge punctuation (mapping.py:128-150)."""
    normalized = _WS_RX.sub(" ", text.lower()).strip()
    return _EDGE_PUNCT_RX.sub("", normalized)


def jaccard_similarity(text1: str, text2: str) -> float:
    """Token-set Jaccard over normalized texts (mapping.py:152-175)."""
    t1 = set(normalize_text(text1).split())
    t2 = set(normalize_text(text2).split())
    if not t1 or not t2:
        return 0.0
    union = len(t1 | t2)
    return len(t1 & t2) / union if union else 0.0
