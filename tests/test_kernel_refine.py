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
