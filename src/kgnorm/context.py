"""Scope-based clinical context analysis (advanced NegEx).

Port of the reference's second-largest semantic module,
``backend/app/services/clinical_context.py``:

* ``NegationDetector`` (:102-404): pre/post-negation, uncertainty and
  hypothetical trigger lexicons with 50-char scope windows bounded by
  terminator tokens (NegEx-style);
* ``SectionDetector`` (:407-570): 16 clinical-section header pattern
  groups, position → section resolution;
* ``HistoricalDetector`` (:572-652) and ``FamilyHistoryDetector``
  (:655-726): preceding-window trigger scans;
* ``ClinicalContextAnalyzer`` (:729-853): combined assertion +
  confidence-modifier computation.

This module is pure Python: it runs inside Arrow-batched ``mapInPandas``
workers (see :mod:`kgnorm.patterns` / :mod:`kgnorm.ensemble`), the same
deployment shape as the dictionary-scan kernel.  All trigger/section
tables are reference data ported verbatim (parity requires byte-identical
lexicons); the surrounding code is reorganized for per-text caching: one
``analyze_text`` pass computes sections + scopes once, and every mention
of the text reuses them (the reference re-derives scopes per mention in
``get_assertion`` — O(mentions × text); here it is O(text + mentions)).

Reference quirks preserved deliberately:
* ``\\brunlikely\\b`` post-negation trigger (sic, clinical_context.py:162);
* historical/current trigger checks return on the FIRST match found
  (clinical_context.py:643-652);
* pre-negation "trigger immediately before mention" fallback uses a
  ``<= 5`` character slack (clinical_context.py:360-361, 398).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# assertion / section vocabularies (clinical_context.py:24-52)
# ---------------------------------------------------------------------------

PRESENT = "present"
ABSENT = "absent"
UNCERTAIN = "uncertain"
HYPOTHETICAL = "hypothetical"
HISTORICAL = "historical"
FAMILY = "family"

SEC_CHIEF_COMPLAINT = "chief_complaint"
SEC_HPI = "history_of_present_illness"
SEC_PMH = "past_medical_history"
SEC_PSH = "past_surgical_history"
SEC_FAMILY_HISTORY = "family_history"
SEC_SOCIAL_HISTORY = "social_history"
SEC_MEDICATIONS = "medications"
SEC_ALLERGIES = "allergies"
SEC_ROS = "review_of_systems"
SEC_PHYSICAL_EXAM = "physical_exam"
SEC_VITALS = "vitals"
SEC_LABS = "labs"
SEC_IMAGING = "imaging"
SEC_ASSESSMENT = "assessment"
SEC_PLAN = "plan"
SEC_UNKNOWN = "unknown"


# ---------------------------------------------------------------------------
# trigger lexicons (reference data, clinical_context.py:113-237)
# ---------------------------------------------------------------------------

PRE_NEGATION_TRIGGERS = [
    r"\bno\b", r"\bnot\b", r"\bwithout\b", r"\bdeny\b", r"\bdenies\b",
    r"\bdenied\b", r"\bnegative for\b", r"\brules out\b", r"\bruled out\b",
    r"\br/o\b", r"\bfree of\b", r"\babsence of\b", r"\babsent\b",
    r"\bno evidence of\b", r"\bno signs of\b", r"\bno symptoms of\b",
    r"\bno history of\b", r"\bno known\b", r"\bnever had\b", r"\bnever\b",
    r"\bfailed to reveal\b", r"\btest negative\b", r"\btested negative\b",
    r"\bnon-?diagnostic\b", r"\bexclude[ds]?\b", r"\bexcluding\b",
    r"\bunremarkable\b", r"\bnormal\b(?=\s+(?:limits?|range|findings?))",
    r"\bwas not\b", r"\bwere not\b", r"\bdid not have\b", r"\bdoes not have\b",
    r"\bhas no\b", r"\bhave no\b", r"\bno apparent\b", r"\bno acute\b",
    r"\bno significant\b", r"\bno obvious\b", r"\bno gross\b",
    r"\bno definite\b", r"\bresolve[ds]?\b", r"\bresolution of\b",
]

POST_NEGATION_TRIGGERS = [
    r"\brunlikely\b",  # sic — preserved from clinical_context.py:162
    r"\bhas been ruled out\b", r"\bwas ruled out\b", r"\bwere ruled out\b",
    r"\bnot present\b", r"\bnot seen\b", r"\bnot observed\b",
    r"\bnot identified\b", r"\bnot detected\b", r"\bnot demonstrated\b",
    r"\bwas negative\b", r"\bwere negative\b",
]

UNCERTAINTY_TRIGGERS = [
    r"\bpossible\b", r"\bpossibly\b", r"\bprobable\b", r"\bprobably\b",
    r"\blikely\b", r"\bsuspect(?:ed|s)?\b", r"\bsuspicious\b",
    r"\bsuggestive\b", r"\bquestionable\b", r"\buncertain\b", r"\bunclear\b",
    r"\bequivocal\b", r"\bcannot be excluded\b", r"\bcannot rule out\b",
    r"\bconcern(?:ed|ing)? for\b", r"\braise[sd]? concern\b", r"\bworrisome\b",
    r"\bmay (?:be|have|represent)\b", r"\bmight (?:be|have|represent)\b",
    r"\bcould (?:be|have|represent)\b", r"\b(?:differential|ddx)\b.*\bincludes?\b",
    r"\brule out\b", r"\b\?\b",
]

HYPOTHETICAL_TRIGGERS = [
    r"\bif\b", r"\bshould\b", r"\bwould\b", r"\bcould\b", r"\bwill (?:be|have)\b",
    r"\bwatch for\b", r"\breturn (?:precautions|if)\b", r"\bmonitor for\b",
    r"\bin (?:the )?event of\b", r"\bin case of\b",
]

SCOPE_TERMINATORS = [
    r"\bbut\b", r"\bhowever\b", r"\balthough\b", r"\bthough\b",
    r"\baside from\b", r"\bexcept\b", r"\bapart from\b", r"\bother than\b",
    r"\bnevertheless\b", r"\byet\b", r"\bstill\b", r"\bwhich\b", r"\bthat\b",
    r"\bwho\b", r";", r"\.", r":",
]

MAX_SCOPE_DISTANCE = 50  # clinical_context.py:239

HISTORICAL_TRIGGERS = [
    r"\bhistory of\b", r"\bh/o\b", r"\bpast (?:medical )?history\b",
    r"\bpmh\b", r"\bprevious(?:ly)?\b", r"\bformer(?:ly)?\b", r"\bprior\b",
    r"\bpast\b", r"\bremote\b", r"\bchildhood\b", r"\byears? ago\b",
    r"\bmonths? ago\b", r"\b(?:in|since) (?:19|20)\d{2}\b", r"\bresolved\b",
    r"\bquiescent\b", r"\binactive\b", r"\bremission\b", r"\bs/p\b",
    r"\bstatus post\b", r"\bpost-?\b",
]

CURRENT_TRIGGERS = [
    r"\bcurrent(?:ly)?\b", r"\bactive\b", r"\bacute(?:ly)?\b", r"\bongoing\b",
    r"\bpresent(?:ly|ing)?\b", r"\bnew(?:ly)?\b", r"\brecent(?:ly)?\b",
    r"\btoday\b", r"\bthis (?:morning|afternoon|evening)\b", r"\bnow\b",
    r"\bworsening\b", r"\bexacerbation\b",
]

FAMILY_TRIGGERS = [
    r"\bfamily history\b", r"\bfhx?\b", r"\bmother\b", r"\bfather\b",
    r"\bparent[s]?\b", r"\bsibling[s]?\b", r"\bbrother\b", r"\bsister\b",
    r"\bgrandmother\b", r"\bgrandfather\b", r"\bgrandparent[s]?\b",
    r"\baunt\b", r"\buncle\b", r"\bcousin\b", r"\brelative[s]?\b",
    r"\bmaternal\b", r"\bpaternal\b",
]

# clinical_context.py:420-515 — insertion order matters (stable sort below
# keeps it for equal start offsets)
SECTION_PATTERNS: dict[str, list[str]] = {
    SEC_CHIEF_COMPLAINT: [
        r"\bchief complaint[s]?\b", r"\bcc\b(?=\s*:)",
        r"\breason for (?:visit|consultation|admission)\b",
        r"\bpresenting complaint\b",
    ],
    SEC_HPI: [
        r"\bhistory of present(?:ing)? illness\b", r"\bhpi\b(?=\s*:)",
        r"\bpresent(?:ing)? illness\b", r"\bhistory of the present illness\b",
    ],
    SEC_PMH: [
        r"\bpast medical history\b", r"\bpmh\b(?=\s*:)", r"\bmedical history\b",
        r"\bpast history\b", r"\bbackground\b(?=\s*:)",
    ],
    SEC_PSH: [
        r"\bpast surgical history\b", r"\bsurgical history\b", r"\bpsh\b(?=\s*:)",
        r"\boperations?\b(?=\s*:)", r"\bprocedures?\b(?=\s*:)",
    ],
    SEC_FAMILY_HISTORY: [
        r"\bfamily (?:medical )?history\b", r"\bfhx?\b(?=\s*:)", r"\bfamily hx\b",
    ],
    SEC_SOCIAL_HISTORY: [
        r"\bsocial history\b", r"\bshx?\b(?=\s*:)", r"\bsocial hx\b",
        r"\bhabits?\b(?=\s*:)",
    ],
    SEC_MEDICATIONS: [
        r"\bmedications?\b", r"\bmeds?\b(?=\s*:)", r"\bcurrent medications?\b",
        r"\bhome medications?\b", r"\bmedication list\b", r"\bdrugs?\b(?=\s*:)",
    ],
    SEC_ALLERGIES: [
        r"\ballergi(?:es|c)\b", r"\bnkda\b", r"\bdrug allergi(?:es|c)\b",
        r"\badverse (?:drug )?reactions?\b",
    ],
    SEC_ROS: [
        r"\breview of systems?\b", r"\bros\b(?=\s*:)", r"\bsystems? review\b",
    ],
    SEC_PHYSICAL_EXAM: [
        r"\bphysical exam(?:ination)?\b", r"\bpe\b(?=\s*:)",
        r"\bexam(?:ination)?\b(?=\s*:)", r"\bobjective\b(?=\s*:)",
        r"\bfindings?\b(?=\s*:)",
    ],
    SEC_VITALS: [
        r"\bvital signs?\b", r"\bvitals?\b(?=\s*:)", r"\bvs\b(?=\s*:)",
    ],
    SEC_LABS: [
        r"\blab(?:oratory)?(?: results?)?\b(?=\s*:)", r"\blabs?\b(?=\s*:)",
        r"\btest results?\b", r"\bchemistry\b", r"\bcbc\b", r"\bbmp\b", r"\bcmp\b",
    ],
    SEC_IMAGING: [
        r"\bimaging\b", r"\bradiology\b", r"\bx-?ray\b", r"\bct\b(?=\s)",
        r"\bmri\b", r"\bultrasound\b", r"\becg\b", r"\bekg\b",
        r"\bechocardiogram\b",
    ],
    SEC_ASSESSMENT: [
        r"\bassessment\b(?=\s*:|\s*(?:and|&))", r"\bimpression\b",
        r"\bdiagnos(?:is|es)\b", r"\bddx\b", r"\bdifferential\b", r"\bconclusion\b",
    ],
    SEC_PLAN: [
        r"\bplan\b(?=\s*:)", r"\brecommendations?\b", r"\btreatment(?: plan)?\b",
        r"\bmanagement\b", r"\bdisposition\b", r"\bfollow[- ]?up\b",
    ],
}


def _alt(patterns: list[str]) -> re.Pattern:
    return re.compile("|".join(f"({p})" for p in patterns), re.IGNORECASE)


_PRE_NEG = _alt(PRE_NEGATION_TRIGGERS)
_POST_NEG = _alt(POST_NEGATION_TRIGGERS)
_UNCERTAIN = _alt(UNCERTAINTY_TRIGGERS)
_HYPOTHETICAL = _alt(HYPOTHETICAL_TRIGGERS)
_TERMINATOR = _alt(SCOPE_TERMINATORS)
_HISTORICAL = _alt(HISTORICAL_TRIGGERS)
_CURRENT = _alt(CURRENT_TRIGGERS)
_FAMILY = _alt(FAMILY_TRIGGERS)
_SECTIONS = [(sec, _alt(pats)) for sec, pats in SECTION_PATTERNS.items()]


# ---------------------------------------------------------------------------
# scopes and sections
# ---------------------------------------------------------------------------


@dataclass
class Scope:
    trigger: str
    trigger_start: int
    trigger_end: int
    scope_start: int
    scope_end: int
    negation_type: str  # "negation" | "uncertainty" | "hypothetical"


@dataclass
class Section:
    section: str
    header: str
    start: int
    end: int


@dataclass
class MentionContext:
    assertion: str
    section: str
    is_negated: bool
    is_uncertain: bool
    is_historical: bool
    is_family_history: bool
    confidence_modifier: float
    context_clues: list[str] = field(default_factory=list)


def _scope_end(text: str, start: int) -> int:
    """Forward scope boundary (clinical_context.py:325-334)."""
    remaining = text[start:start + MAX_SCOPE_DISTANCE]
    m = _TERMINATOR.search(remaining)
    if m:
        return start + m.start()
    return start + min(len(remaining), MAX_SCOPE_DISTANCE)


def _scope_start(text: str, end: int) -> int:
    """Backward scope boundary — LAST terminator wins (clinical_context.py:336-345)."""
    start = max(0, end - MAX_SCOPE_DISTANCE)
    base = start
    for m in _TERMINATOR.finditer(text[start:end]):
        start = base + m.end()
    return start


def find_scopes(text: str) -> list[Scope]:
    """All negation/uncertainty/hypothetical scopes, in the reference's
    emission order (pre-neg, post-neg, uncertainty, hypothetical —
    clinical_context.py:263-323); order matters for first-match assertion."""
    scopes: list[Scope] = []
    for m in _PRE_NEG.finditer(text):
        scopes.append(Scope(m.group(), m.start(), m.end(), m.end(), _scope_end(text, m.end()), "negation"))
    for m in _POST_NEG.finditer(text):
        scopes.append(Scope(m.group(), m.start(), m.end(), _scope_start(text, m.start()), m.start(), "negation"))
    for m in _UNCERTAIN.finditer(text):
        scopes.append(Scope(m.group(), m.start(), m.end(), m.end(), _scope_end(text, m.end()), "uncertainty"))
    for m in _HYPOTHETICAL.finditer(text):
        scopes.append(Scope(m.group(), m.start(), m.end(), m.end(), _scope_end(text, m.end()), "hypothetical"))
    return scopes


def detect_sections(text: str) -> list[Section]:
    """All section headers, sorted by offset (clinical_context.py:523-557)."""
    sections: list[Section] = []
    for sec, pattern in _SECTIONS:
        for m in pattern.finditer(text):
            sections.append(Section(sec, m.group(), m.start(), -1))
    sections.sort(key=lambda s: s.start)
    for i, s in enumerate(sections):
        s.end = sections[i + 1].start if i + 1 < len(sections) else len(text)
    return sections


def section_at(sections: list[Section], position: int) -> str:
    for s in sections:
        if s.start <= position < s.end:
            return s.section
    return SEC_UNKNOWN


def get_assertion(scopes: list[Scope], mention_start: int, mention_end: int) -> tuple[str, str | None]:
    """First-matching-scope assertion (clinical_context.py:372-404)."""
    for scope in scopes:
        in_scope = (
            (scope.scope_start <= mention_start and mention_end <= scope.scope_end)
            or (scope.trigger_end <= mention_start <= scope.trigger_end + 5)
        )
        if in_scope:
            if scope.negation_type == "negation":
                return ABSENT, scope.trigger
            if scope.negation_type == "uncertainty":
                return UNCERTAIN, scope.trigger
            if scope.negation_type == "hypothetical":
                return HYPOTHETICAL, scope.trigger
    return PRESENT, None


def is_historical(text: str, mention_start: int) -> tuple[bool, str | None]:
    """Preceding-30-char trigger scan; historical beats current
    (clinical_context.py:623-652)."""
    preceding = text[max(0, mention_start - 30):mention_start].lower()
    m = _HISTORICAL.search(preceding)
    if m:
        return True, m.group()
    if _CURRENT.search(preceding):
        return False, None
    return False, None


def is_family_history(
    text: str, mention_start: int, mention_end: int, sections: list[Section]
) -> tuple[bool, str | None]:
    """Family-history section membership, else ±50-char trigger window
    (clinical_context.py:684-726)."""
    for s in sections:
        if s.section == SEC_FAMILY_HISTORY and s.start <= mention_start < s.end:
            return True, "family history section"
    context_start = max(0, mention_start - 50)
    context = text[context_start:min(len(text), mention_end + 20)].lower()
    for m in _FAMILY.finditer(context):
        if abs(context_start + m.start() - mention_start) < 50:
            return True, m.group()
    return False, None


def analyze_mention(
    text: str,
    mention_start: int,
    mention_end: int,
    sections: list[Section],
    scopes: list[Scope],
) -> MentionContext:
    """Combined context analysis (clinical_context.py:743-829), with
    sections + scopes computed once per text and passed in."""
    section = section_at(sections, mention_start)
    assertion, neg_trigger = get_assertion(scopes, mention_start, mention_end)
    historical, hist_trigger = is_historical(text, mention_start)
    family, family_trigger = is_family_history(text, mention_start, mention_end, sections)

    if family:
        assertion = FAMILY
    elif historical and assertion == PRESENT:
        assertion = HISTORICAL

    clues = []
    if neg_trigger:
        clues.append(f"negation: {neg_trigger}")
    if hist_trigger:
        clues.append(f"historical: {hist_trigger}")
    if family_trigger:
        clues.append(f"family: {family_trigger}")

    modifier = 1.0
    if assertion == ABSENT:
        modifier = 0.0
    elif assertion == UNCERTAIN:
        modifier = 0.7
    elif assertion == HYPOTHETICAL:
        modifier = 0.3
    elif assertion == FAMILY:
        modifier = 0.0
    elif assertion == HISTORICAL:
        modifier = 0.8

    if section == SEC_FAMILY_HISTORY:
        modifier = 0.0
    elif section == SEC_ROS and assertion == ABSENT:
        modifier = 0.0

    return MentionContext(
        assertion=assertion,
        section=section,
        is_negated=assertion == ABSENT,
        is_uncertain=assertion == UNCERTAIN,
        is_historical=assertion == HISTORICAL,
        is_family_history=(assertion == FAMILY or section == SEC_FAMILY_HISTORY),
        confidence_modifier=modifier,
        context_clues=clues,
    )


def analyze_text(text: str) -> tuple[list[Section], list[Scope]]:
    """One-pass precomputation for all mentions of a text
    (clinical_context.py:831-853)."""
    return detect_sections(text), find_scopes(text)
