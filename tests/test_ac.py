"""Aho-Corasick matcher semantics (parity with pyahocorasick's iter)."""

import sys

from kgnorm.ac import Automaton, build_automaton


def brute_force(patterns, text):
    """All (end_inclusive, payload) occurrences, ascending by end."""
    hits = []
    for i in range(len(text)):
        for p, payload in patterns:
            if text.startswith(p, i):
                hits.append((i + len(p) - 1, payload))
    hits.sort(key=lambda h: h[0])
    return hits


def test_overlapping_and_nested_matches():
    patterns = [("he", 1), ("she", 2), ("his", 3), ("hers", 4)]
    a = Automaton()
    for p, v in patterns:
        a.add_word(p, v)
    a.make_automaton()
    got = list(a.iter("ushers"))
    # 'she' ends at 3, 'he' ends at 3, 'hers' ends at 5
    assert sorted(got) == sorted([(3, 2), (3, 1), (5, 4)])


def test_matches_ascending_end_order():
    a = Automaton()
    for p, v in [("ab", "ab"), ("abc", "abc"), ("b", "b"), ("bc", "bc")]:
        a.add_word(p, v)
    a.make_automaton()
    ends = [e for e, _ in a.iter("xabcx")]
    assert ends == sorted(ends)


def test_brute_force_equivalence_randomized():
    import random

    rng = random.Random(42)
    alphabet = "abch "
    for _ in range(50):
        pats = sorted({"".join(rng.choice(alphabet) for _ in range(rng.randint(1, 4))).strip() for _ in range(8)})
        pats = [p for p in pats if p]
        patterns = [(p, i) for i, p in enumerate(pats)]
        a = Automaton()
        for p, v in patterns:
            a.add_word(p, v)
        a.make_automaton()
        text = "".join(rng.choice(alphabet) for _ in range(60))
        got = sorted(a.iter(text))
        want = sorted(brute_force(patterns, text))
        assert got == want


def test_regex_trie_matcher_equivalence(ontology_bundle, golden_notes):
    """RegexTrieMatcher must yield the same match SET as the pure AC, and
    the same FINAL mention list through extract_mentions (order included)."""
    from kgnorm import rules
    from kgnorm.ac import RegexTrieMatcher

    pure = build_automaton(ontology_bundle.dictionary, impl="pure")
    fast = RegexTrieMatcher(ontology_bundle.dictionary)
    texts = [n["text"] for n in golden_notes]
    texts += [
        "type 2 diabetes mellitus and type 2 diabetes overlap check",
        "chf chf chf", "", "no match here at all 123",
        "congestive heart failure vs heart failure vs failure",
    ]
    for text in texts:
        low = text.lower()
        assert sorted(pure.iter(low)) == sorted(fast.iter(low)), text
        assert rules.extract_mentions(text, pure) == rules.extract_mentions(text, fast), text


def test_regex_trie_randomized_equivalence():
    import random

    from kgnorm.ac import RegexTrieMatcher

    rng = random.Random(11)
    words = ["ab", "abc", "abcd", "b", "bc", "c ab", "x", "ab x", "ab x y"]
    patterns = [(w, i) for i, w in enumerate(words)]
    pure = build_automaton(patterns, impl="pure")
    fast = RegexTrieMatcher(patterns)
    for _ in range(200):
        text = "".join(rng.choice("abcxy ") for _ in range(50))
        assert sorted(pure.iter(text)) == sorted(fast.iter(text)), text


def test_first_wins_duplicate_patterns():
    auto = build_automaton([("chf", ("CHF", "Condition", 1)), ("chf", ("chf", "Drug", 2))])
    hits = list(auto.iter("chf"))
    assert hits == [(2, ("CHF", "Condition", 1))]


def test_c_extension_parity_if_available(ontology_bundle):
    """When pyahocorasick is installed, both implementations must agree."""
    try:
        import ahocorasick
    except ImportError:
        return
    pure = Automaton()
    seen = set()
    for k, v in ontology_bundle.dictionary:
        if k in seen:
            continue
        seen.add(k)
        pure.add_word(k, v)
    pure.make_automaton()
    fast = build_automaton(ontology_bundle.dictionary)
    text = "patient with chf, htn and type 2 diabetes mellitus on metformin"
    assert sorted(pure.iter(text)) == sorted(fast.iter(text))
