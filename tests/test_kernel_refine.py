"""M4-analogue refinement (reference refinement.py:41-120 semantics):
trailing fragments stripped with loose separators; INTERIOR share chains
stripped only when explicitly pipe/bullet-delimited and whitespace-flanked
— coherent prose is never deleted."""

from martial_arts_ocr_spark.kernel.pipeline import extract_document
from martial_arts_ocr_spark.kernel.refine import refine_text


def test_share_chain_stripped():
    t, r = refine_text("Real article sentence here. Share | Tweet | Email")
    assert t == "Real article sentence here."
    assert r is True


def test_single_share_word_kept():
    # one word is not a chain — could be legitimate prose
    t, r = refine_text("They decided to Share")
    assert r is False


def test_read_more_tail_stripped():
    t, r = refine_text("The story continues elsewhere. Read more")
    assert t == "The story continues elsewhere."
    assert r is True


def test_interior_delimited_chain_stripped():
    t, r = refine_text(
        "First sentence ends. Share | Tweet | Email Second sentence follows."
    )
    assert t == "First sentence ends. Second sentence follows."
    assert r is True


def test_interior_chain_at_string_start_kept():
    # no leading whitespace → not an embedded fragment; could be a block
    # that legitimately begins with these words
    s = "Share | Tweet | Email is what the buttons say, and the text goes on."
    t, r = refine_text(s)
    assert t == s
    assert r is False


def test_interior_undelimited_words_kept():
    # space-separated share words inside prose are NOT stripped (interior
    # conservatism: explicit separators required)
    s = "We decided to Share Tweet Email with everyone at the meeting today."
    t, r = refine_text(s)
    assert t == s
    assert r is False


def test_pipeline_interior_refinement():
    html = (b"<p>A perfectly ordinary paragraph with enough words for the "
            b"scorer to accept it easily. Share | Tweet | Email The story "
            b"then continues with a second thought.</p>")
    row = extract_document("https://x.test/refine-interior", html)
    assert row["n_refined"] == 1
    assert "Share | Tweet" not in row["text"]
    assert "accept it easily. The story then continues" in row["text"]


def test_stacked_tails_both_stripped():
    t, r = refine_text("Body text ends here. Related articles: foo bar Share | Tweet")
    assert t == "Body text ends here."


def test_pipeline_refines_and_flags():
    html = (b"<p>A perfectly ordinary paragraph with enough words for the "
            b"scorer to accept it without question. Share | Tweet | Email</p>")
    row = extract_document("https://x.test/refine", html)
    assert row["n_refined"] == 1
    assert row["reading_order_uncertain"] is True
    assert "Share | Tweet" not in row["text"]
    assert row["text"].endswith("without question.")


# --- differential fuzz: linear rewrites vs the original quadratic forms ------

def _ref_process_lines(text):
    """The original (quadratic-concat) process_lines, kept as the semantic
    reference for the fuzz below."""
    import re
    _TERMINAL_RE = re.compile(r"[.!?:;。！？]$")
    lines = text.split("\n")
    merged = []
    i = 0
    while i < len(lines):
        line = lines[i].rstrip()
        if line.endswith("-") and i + 1 < len(lines):
            nxt = lines[i + 1].lstrip()
            if nxt and nxt[0].islower():
                lines[i + 1] = line[:-1] + nxt
                i += 1
                continue
        if merged and line and line[0].islower():
            prev = merged[-1]
            if prev and not _TERMINAL_RE.search(prev):
                merged[-1] = prev + " " + line
                i += 1
                continue
        merged.append(line)
        i += 1
    deduped = []
    for line in merged:
        if not deduped or line != deduped[-1]:
            deduped.append(line)
    return "\n".join(deduped)


def test_process_lines_matches_reference_fuzz():
    import random

    from martial_arts_ocr_spark.kernel.cleanup import process_lines

    rng = random.Random(17)
    frags = ["word", "Word", "end.", "x-", "-", "", " ", "  lower",
             "UPPER", "tail:", "same", "same", "a。", "ya?", "\tz",
             "one two-", "p ", "é", "...", "it"]
    for _ in range(4000):
        text = "\n".join(rng.choice(frags)
                         for _ in range(rng.randint(0, 14)))
        assert process_lines(text) == _ref_process_lines(text), repr(text)


def test_trailing_share_chain_matches_regex_fuzz():
    import random

    from martial_arts_ocr_spark.kernel.refine import (
        TRAILING_SHARE_CHAIN_RE, _strip_trailing_share_chain)

    rng = random.Random(23)
    toks = ["Share", "Tweet", "Pin", "Pin it", "Email", "Print", "Save",
            "Like", "Follow us", "|", "·", "/", " ", "  ", "\t", "x",
            "word", ".", "!", "", "us", "it", "share"]
    for _ in range(8000):
        s = "".join(rng.choice(toks) for _ in range(rng.randint(0, 12)))
        assert (_strip_trailing_share_chain(s)
                == TRAILING_SHARE_CHAIN_RE.sub("", s)), repr(s)


def test_refine_flood_is_fast():
    import time

    from martial_arts_ocr_spark.kernel.cleanup import process_lines
    from martial_arts_ocr_spark.kernel.refine import refine_text

    for s in (" Share |" * 20000 + " x",
              "Share " * 30000 + "end."):
        t0 = time.perf_counter()
        refine_text(s)
        assert time.perf_counter() - t0 < 3.0
    for flood in ("same line\n" * 100000, "word-\n" * 100000):
        t0 = time.perf_counter()
        process_lines(flood)
        assert time.perf_counter() - t0 < 3.0


def test_readmore_requires_word_boundary():
    """'Read more' stripping must not truncate prose mid-word
    (review-found: 'largely unread more' lost 'read more' from 'unread')."""
    from martial_arts_ocr_spark.kernel.refine import refine_text

    keep = "Essays on budo remain largely unread more"
    assert refine_text(keep)[0] == keep
    stripped, changed = refine_text(
        "A full paragraph of real content sits here. Read more"
    )
    assert changed and stripped.endswith("here.")
