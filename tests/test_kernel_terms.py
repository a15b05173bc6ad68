"""Terminology join + macron-candidate tests (J4/J5).

Mirrors ``/root/reference/tests/test_macron_normalization_candidates.py``
intents: word-boundary matching, span dedup, ambiguity marking, no text
mutation.
"""

from martial_arts_ocr_spark.kernel.terms import (
    extract_terms,
    find_macron_candidates,
)


def test_longest_match_first():
    hits = extract_terms("空手道の稽古")
    assert [(h.term, h.pos) for h in hits] == [("空手道", 0), ("稽古", 4)]
    # NOT 空手 then 道
    assert hits[0].romaji == "karate-dō"


def test_all_occurrences_with_positions():
    hits = extract_terms("武道と武道")
    assert [(h.term, h.pos) for h in hits] == [("武道", 0), ("武道", 3)]


def test_no_hits_on_plain_english():
    assert extract_terms("plain english text") == []


def test_macron_variant_found_with_span():
    cands = find_macron_candidates("He trained in the Daito-ryu style.")
    assert len(cands) == 1
    c = cands[0]
    assert (c.observed, c.candidate) == ("Daito-ryu", "Daitō-ryū")
    assert (c.start, c.end) == (18, 27)
    assert "trained in the" in c.context


def test_word_boundary_respected():
    # 'judo' inside a larger word must not match
    assert find_macron_candidates("pseudojudoka") == []
    assert len(find_macron_candidates("practice judo daily")) == 1


def test_dedup_and_sorted_by_span():
    cands = find_macron_candidates("dojo first, then koryu, then dojo")
    spans = [(c.start, c.candidate) for c in cands]
    assert spans == sorted(spans)
    assert len([c for c in cands if c.candidate == "dōjō"]) == 2


def test_canonical_form_not_flagged():
    assert find_macron_candidates("Daitō-ryū is canonical") == []


def test_macron_fallback_on_length_changing_lowercase():
    """'İ'.lower() is two chars, so the case-sensitive fast scan's 1:1
    offset proof does not hold — the IGNORECASE fallback path must produce
    correctly-anchored spans."""
    from martial_arts_ocr_spark.kernel.terms import find_macron_candidates

    s = "İ Daito-ryu practice"
    assert len(s.lower()) != len(s)           # the fallback trigger
    cands = find_macron_candidates(s)
    assert [(c.observed, c.candidate, c.start, c.end) for c in cands] == [
        ("Daito-ryu", "Daitō-ryū", 2, 11)
    ]
    assert s[2:11] == "Daito-ryu"
