"""A2 candidate-ladder tests: consensus / fullpage / regex rungs.

Ports the reference's PSM-variant selection intent
(``/root/reference/src/martial_arts_ocr/ocr/engines.py:119-168``: several
extraction variants scored through one candidate_score, best kept) to the
web kernel: three whole-document candidates, decision_source records the
winner.
"""

from martial_arts_ocr_spark.kernel.pipeline import extract_document
from martial_arts_ocr_spark.kernel.rawtext import extract_rawtext

_LONG = ("The actual article text with plenty of common words in it for "
         "the density scorer to accept without any hesitation and enough "
         "length that the candidate score passes every bonus threshold "
         "with room to spare for all of the readers involved. " * 3)


def test_rung1_consensus_on_normal_page():
    html = f"<body><h1>Title</h1><p>{_LONG}</p><p>{_LONG}</p></body>".encode()
    row = extract_document("https://x.test/1", html)
    assert row["status"] == "completed"
    assert row["decision_source"] == "consensus"
    assert row["n_blocks"] >= 3


def test_rung3_regex_salvages_unclosed_object():
    # an unclosed <object> makes the block parser drop everything after it
    # (skip_depth never returns to 0) → zero usable blocks → rung 3
    html = f"<body><object><p>{_LONG}</p><p>{_LONG}</p></body>".encode()
    row = extract_document("https://x.test/2", html)
    assert row["status"] == "completed"
    assert row["decision_source"] == "regex"
    assert "actual article text" in row["text"]
    assert row["n_blocks"] == 0 and row["figures"] == []
    assert row["reading_order_uncertain"] is True


def test_rung3_regex_beats_degenerate_blocks():
    # one tiny visible block, the rest swallowed mid-document: consensus
    # and fullpage see only "hi there", regex recovers the full text
    html = (f"<body><p>hi there</p><object><p>{_LONG}</p>"
            f"<p>{_LONG}</p></body>").encode()
    row = extract_document("https://x.test/3", html)
    assert row["status"] == "completed"
    assert row["decision_source"] == "regex"
    assert "actual article text" in row["text"]


def test_rung2_fullpage_still_wins_when_blocks_exist():
    # degenerate but parseable: consensus rejects the short block, the
    # fullpage candidate keeps it, regex offers nothing longer
    row = extract_document("https://x.test/4", b"<p>hi there world</p>")
    assert row["status"] == "completed"
    assert row["decision_source"] in ("fullpage", "consensus")
    assert "hi there world" in row["text"]


# a pure link farm: density hard-rejects every block (link_density > 0.66)
# so the consensus text is empty, but the blocks are not chrome — the
# fullpage rung keeps them and its candidate score (long text, 10+ words)
# beats both the empty consensus and the lower-prior regex rung
_LINK_FARM = "<body>" + "".join(
    f'<div class="x"><a href="/{i}">interesting article number {i} here</a>'
    "</div>" for i in range(8)
) + "</body>"


def test_rung2_fullpage_wins_on_link_farm():
    row = extract_document("https://x.test/5", _LINK_FARM.encode())
    assert row["status"] == "completed"
    assert row["decision_source"] == "fullpage"
    assert "interesting article number 3" in row["text"]


def test_all_three_sources_reachable():
    pages = [
        f"<body><h1>T</h1><p>{_LONG}</p><p>{_LONG}</p></body>",
        _LINK_FARM,
        f"<body><object><p>{_LONG}</p></body>",
    ]
    seen = {
        extract_document(f"https://x.test/{i}", p.encode())["decision_source"]
        for i, p in enumerate(pages)
    }
    assert seen == {"consensus", "fullpage", "regex"}


def test_rawtext_extractor_basics():
    assert extract_rawtext("<p>a&amp;b</p><script>var x=1;</script>") == "a&b"
    assert extract_rawtext("<!-- c --><style>p{}</style>") == ""
    assert extract_rawtext("<noscript>kept text</noscript>") == "kept text"


def test_empty_and_no_text_pages_still_fail():
    assert extract_document("u", b"")["error"] == "empty_html"
    row = extract_document("u", b"<object><script>x</script>")
    assert row["status"] == "failed" and row["error"] == "no_blocks"
