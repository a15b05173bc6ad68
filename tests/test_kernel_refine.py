"""M4-analogue refinement: trailing boilerplate fragments inside accepted
blocks are stripped conservatively (reference refinement.py semantics:
keep coherent mass, flag for review, never touch interior text)."""

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


def test_interior_fragment_untouched():
    s = "Share | Tweet | Email is what the buttons say, and the text goes on."
    t, r = refine_text(s)
    assert t == s
    assert r is False


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
