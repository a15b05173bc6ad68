"""Block segmentation + extractor + consensus + assembly tests.

Ports the reference's reading-order/grouping test intents
(``/root/reference/tests/test_ocr_text_reading_order.py:19-80``:
paragraph grouping, caption separation, list preservation) to the DOM
world, plus the text-likeness rejection tests
(``tests/test_image_region_text_like_rejection.py`` analogues).
"""

from martial_arts_ocr_spark.kernel.consensus import merge_blocks
from martial_arts_ocr_spark.kernel.density import score_block
from martial_arts_ocr_spark.kernel.domtree import classify_blocks
from martial_arts_ocr_spark.kernel.html_blocks import segment_blocks
from martial_arts_ocr_spark.kernel.pipeline import extract_document
from martial_arts_ocr_spark.kernel.regions import detect_figures, merge_spans


def _decide(html: str):
    blocks = segment_blocks(html)
    a = [score_block(b) for b in blocks]
    d = classify_blocks(blocks)
    return blocks, merge_blocks(blocks, a, d)


def test_blocks_in_document_order():
    html = "<body><h1>Title</h1><p>First para.</p><p>Second para.</p></body>"
    blocks = segment_blocks(html)
    assert [b.text for b in blocks] == ["Title", "First para.", "Second para."]
    starts = [b.start for b in blocks]
    assert starts == sorted(starts)


def test_script_style_subtrees_skipped():
    html = ("<body><script>var x='<p>fake</p>';</script>"
            "<style>p{}</style><p>real content here</p></body>")
    blocks = segment_blocks(html)
    assert [b.text for b in blocks] == ["real content here"]


def test_self_closing_skip_tags_do_not_leak():
    """Regression: a self-closing <iframe/>/<script/> must not swallow the
    rest of the document (skip_depth leak in handle_startendtag)."""
    for frag in ("<iframe/>", "<script/>", "<noscript/>", "<object/>",
                 "<style/>", "<template/>"):
        html = f"<body><p>before</p>{frag}<p>after</p></body>"
        for engine in ("stdlib", "fast"):
            texts = [b.text for b in segment_blocks(html, engine=engine)]
            assert texts == ["before", "after"], (frag, engine, texts)


def test_nav_rejected_content_kept():
    html = ('<body><nav><a href="/">Home</a> <a href="/b">About</a> '
            '<a href="/c">More</a></nav>'
            "<p>The actual article text with plenty of common words in it "
            "for the density scorer to accept without any hesitation.</p>"
            "</body>")
    blocks, decisions = _decide(html)
    by_text = {d.block.text[:10]: d.accept for d in decisions}
    assert by_text["Home About"] is False
    assert by_text["The actual"] is True


def test_chrome_class_rejected():
    html = ('<body><div class="cookie-banner">We use cookies here.</div>'
            "<p>Real paragraph with the usual amount of readable text in "
            "it for the scorer.</p></body>")
    blocks, decisions = _decide(html)
    cookie = [d for d in decisions if "cookies" in d.block.text][0]
    assert cookie.accept is False


def test_link_farm_sibling_rejection():
    cards = "".join(
        f'<div class="card"><a href="/{i}">Card {i} link</a></div>'
        for i in range(4)
    )
    html = f"<body>{cards}<p>Long enough real content sentence with many " \
           f"ordinary words present.</p></body>"
    blocks, decisions = _decide(html)
    card_decisions = [d for d in decisions if "Card" in d.block.text]
    assert card_decisions and all(not d.accept for d in card_decisions)


def test_figure_caption_and_region():
    html = ("<body><p>Intro paragraph with plenty of regular text for "
            "acceptance by the scorer.</p>"
            '<figure><img src="x.png" alt="">'
            "<figcaption>Fig. 1 An old scroll</figcaption></figure></body>")
    blocks, decisions = _decide(html)
    figs = detect_figures(decisions)
    assert len(figs) == 1
    assert figs[0].caption == "Fig. 1 An old scroll"
    assert figs[0].confidence == 0.90


def test_region_span_merge_and_containment():
    from martial_arts_ocr_spark.kernel.regions import Region

    regions = [
        Region(1, "figure", 0, 100, "a", 0.9),
        Region(2, "figure", 105, 160, "", 0.9),   # gap 5 ≤ 12 → merge
        # contained ≥85% in a parent ≤5× its size → suppressed (M2 rule)
        Region(3, "figure", 120, 156, "c", 0.9),
        Region(4, "table", 400, 500, "t", 0.9),   # different type → kept
    ]
    kept, events = merge_spans(regions)
    assert [(r.region_id, r.start, r.end) for r in kept] == [
        (1, 0, 160), (4, 400, 500)
    ]
    assert [r.reading_order for r in kept] == [1, 2]
    actions = sorted(e.action for e in events)
    assert actions == ["merge", "suppress_contained"]


def test_extract_document_reading_order_exact():
    """Golden assembly: exact output text (reference exact-assert style)."""
    html = (b"<html><body>"
            b"<h1>Title Here</h1>"
            b"<p>First paragraph text.</p>"
            b"<ul><li>Alpha item.</li><li>Beta item.</li></ul>"
            b"<p>Last paragraph text.</p>"
            b"</body></html>")
    row = extract_document("https://x.test/1", html)
    assert row["status"] == "completed"
    assert row["text"] == (
        "Title Here\n\n"
        "First paragraph text.\n\n"
        "Alpha item.\nBeta item.\n\n"
        "Last paragraph text."
    )


def test_extract_document_failed_on_empty():
    row = extract_document("https://x.test/2", b"")
    assert row["status"] == "failed"
    assert row["error"] == "empty_html"


def test_fullpage_fallback_on_degenerate():
    # single tiny block → P3 fallback path may fire; must not crash and
    # must keep the text
    row = extract_document("https://x.test/3", b"<p>hi there world</p>")
    assert row["status"] == "completed"
    assert "hi there world" in row["text"]


def test_encoding_latin1_meta():
    html = '<meta charset="iso-8859-1"><p>caf\xe9 costs money</p>'.encode("latin-1")
    row = extract_document("https://x.test/4", html)
    assert row["encoding"] == "latin-1"
    assert "café" in row["text"]


def test_caption_survives_empty_figure_block():
    """img-alt on a <figure> with no direct text must reach the region
    (the figure's own block is discarded by the flush — review-found)."""
    from martial_arts_ocr_spark.kernel.pipeline import extract_document

    html = ("<html><body><article>"
            "<p>Intro paragraph with enough words to stand alone.</p>"
            '<figure><img src="k.png" alt="Kata diagram">'
            "<p>Figure one shows the opening stance.</p></figure>"
            "</article></body></html>").encode()
    row = extract_document("https://x.test/cap", html, "en")
    caps = [f["caption"] for f in row["figures"]]
    assert "Kata diagram" in caps, row["figures"]


def test_rejected_chrome_table_emits_no_region():
    """detect_figures must skip rejected blocks: a footer table's region
    would span text absent from the output (review-found)."""
    from martial_arts_ocr_spark.kernel.pipeline import extract_document

    html = ("<html><body><article>"
            "<p>Main content paragraph one with plenty of words here.</p>"
            "<p>Main content paragraph two with plenty of words here.</p>"
            "</article>"
            '<footer class="footer"><table><tr><td>privacy policy | '
            "cookie policy | terms of use</td></tr></table></footer>"
            "</body></html>").encode()
    row = extract_document("https://x.test/fig", html, "en")
    assert row["figures"] == [], row["figures"]
    assert "privacy policy" not in row["text"]


def test_declared_shift_jis_charset_honored():
    """A declared non-western charset must be used as a decode candidate
    (review-found: the whitelist turned declared shift_jis into latin-1
    mojibake, destroying the ja pipeline)."""
    from martial_arts_ocr_spark.kernel.encoding import decode_html
    from martial_arts_ocr_spark.kernel.pipeline import extract_document

    body = "空手道の歴史は沖縄にある。"
    html = ('<html><head><meta charset="shift_jis"></head><body>'
            f"<p>{body}</p></body></html>").encode("shift_jis")
    text, enc = decode_html(html)
    assert body in text
    assert enc == "shift_jis"
    row = extract_document("https://x.test/sjis", html, "ja")
    assert row["ja_ratio"] > 0
    assert body.rstrip("。") in row["text"]
