"""Cleanup-chain golden tests.

Modeled on the reference's exact-assertion style
(``/root/reference/tests/test_ocr_cleanup_chain.py:10-63`` asserts
``cleaned.splitlines() == [...]`` exactly) — byte-identity is the contract.
"""

from martial_arts_ocr_spark.kernel.cleanup import (
    clean_text,
    fix_mojibake,
    normalize_whitespace,
    process_lines,
    strip_artifacts,
    strip_boilerplate_markers,
)


def test_hyphen_merge():
    assert process_lines("the kor-\nyu schools") == "the koryu schools"


def test_hyphen_no_merge_when_uppercase_next():
    # continuation must start lowercase (postprocessor.py:289-297 rule)
    assert process_lines("the kor-\nYu schools") == "the kor-\nYu schools"


def test_soft_wrap_merge():
    assert process_lines("first part\ncontinues here") == \
        "first part continues here"


def test_soft_wrap_blocked_by_terminal():
    assert process_lines("A sentence ends.\ncontinues here") == \
        "A sentence ends.\ncontinues here"


def test_consecutive_duplicate_lines_dropped():
    assert process_lines("Same line.\nSame line.\nOther.") == \
        "Same line.\nOther."


def test_nonconsecutive_duplicates_kept():
    assert process_lines("Same line.\nOther.\nSame line.") == \
        "Same line.\nOther.\nSame line."


def test_mojibake_fixes():
    assert fix_mojibake("donâ€™t say Ã©lan") == "don’t say élan"


def test_artifact_glyphs_stripped():
    assert strip_artifacts("before ■□ after") == "before  after"


def test_punct_only_line_removed():
    assert strip_artifacts("keep\n...\nalso") == "keep\n\nalso"


def test_isolated_char_line_removed():
    assert strip_artifacts("keep\nx\nalso") == "keep\n\nalso"


def test_boilerplate_strip_requires_two_indicators():
    one = "Accept all cookies now please\nreal content"
    # only one indicator ("cookie") in head → untouched
    assert strip_boilerplate_markers(one) == one


def test_boilerplate_strip_fires():
    txt = ("Skip to main content\nAccept all cookies\n"
           "Real content stays here.")
    out = strip_boilerplate_markers(txt)
    assert "Skip to main" not in out
    assert "Accept all cookies" not in out
    assert "Real content stays here." in out


def test_whitespace_normalize():
    assert normalize_whitespace("a   b\t c\r\nd\n\n\n\ne") == "a b c\nd\n\ne"


def test_full_chain_golden():
    """End-to-end chain: exact expected string (the reference's test style)."""
    raw = ("\x00Skip to main content\n"
           "Accept all cookies\n"
           "The history of kor-\n"
           "yu schools â€” a long\n"
           "tradition lives on. ■\n"
           "Repeated line here.\n"
           "Repeated line here.\n"
           "Subscribe to our cookie newsletter\n")
    out = clean_text(raw)
    assert out == ("The history of koryu schools — a long tradition lives on.\n"
                   "Repeated line here.\n"
                   "Subscribe to our cookie newsletter")


def test_chain_preserves_macrons_and_japanese():
    raw = "Daitō-ryū aiki-jūjutsu 武道の稽古"
    assert clean_text(raw) == "Daitō-ryū aiki-jūjutsu 武道の稽古"


def test_empty_and_none_safe():
    assert clean_text("") == ""
