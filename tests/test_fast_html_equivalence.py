"""A/B gate: the fast tokenizer (kernel/fast_html.py) must produce
block-for-block identical output to the stdlib html.parser path on
fixtures and adversarial soups — the condition for it being the default."""

import random

from hypothesis import given, settings, strategies as st

from martial_arts_ocr_spark.fixtures.gen_pages import generate_pages
from martial_arts_ocr_spark.kernel.encoding import decode_html
from martial_arts_ocr_spark.kernel.html_blocks import segment_blocks


def _sig(blocks):
    return [
        (b.tag, b.node_path, b.start, b.text, b.n_anchor_chars,
         b.in_chrome_tag, b.chrome_class, b.is_figure, b.caption,
         b.parent_path, b.sibling_sig, b.is_heading, b.is_list_item)
        for b in blocks
    ]


def _both(text):
    return (_sig(segment_blocks(text, engine="stdlib")),
            _sig(segment_blocks(text, engine="fast")))


def test_fixture_pages_identical():
    for r in generate_pages(120):
        text, _ = decode_html(r["html"])
        a, b = _both(text)
        assert a == b, r["url"]


_FRAGS = [
    "<p>", "</p>", "<div class='nav x'>", "</div>", "<a href='q'>", "</a>",
    "<br>", "<br/>", "<script>var a='<p>no</p>';</script>",
    "<style>p{}</style>", "text &amp; more", "café &eacute;",
    "<figure><img alt='pic'/>", "</figcaption>",
    "<figcaption>cap</figcaption></figure>", "<!-- c -->", "<![CDATA[x]]>",
    "<!DOCTYPE html>", "<ul><li>item", "</ul>", "a < b", "<td>cell</td>",
    "<h2>Head</h2>", "5 < 6 > 4", "<P>UPPER</P>", "<input value='v'>",
    "<weird-tag>w</weird-tag>", "&#9632;", "&unknown;", "<script>open",
    "<iframe/>", "<script/>", "<noscript/>", "<object/>", "<template/>",
    "<iframe>framed</iframe>", "<style/>",
    # stdlib-tolerant junk constructs (html.parser *_tolerant regexes)
    "<A,>", "<p =>", "<a b=c,>", "<div 'x'>", "</ p>", "</p x>", "</>",
    # uppercase attr names: html.parser lowercases them; the fast engine's
    # prefilter must too (review-found parity bug)
    "<div Class='footer'>", "<span ID=nav>", "<img ALT='Pic'/>",
    "<DIV CLASS=\"menu\">m</DIV>",
    "</3>", "<p/q>", "<p a='1'b=2>", "<x\x00y>", "</p attr='>'>",
    # '>'-reaching backtracking decompositions stdlib's greedy parse
    # never takes (soak-found): '=' -named attrs, quoted '>' at EOF,
    # attr-boundary re-splits before '/>' (fixed by the atomic attrs group)
    '<g\tC =">"', "<D\tx=='>'", '<g a=">\' >', "<p == \">\"",
    "<d- b= 1 =./>_B'B>Aax", '<A. b = 0-: =a/>x',
    '<D\taA".==\t01=\ta/\'//> ="01.1></a>',
]


def test_tolerant_junk_tags_identical():
    for s in ("<A,>x</A,>", "</ p>", "<p>a</p x><p>b</p>", "</>text",
              "</3>tail", "<p =>y", "text<a b=c,>link</a>", "<p/q>z"):
        a, b = _both(s)
        assert a == b, repr(s)


def test_seeded_soups_identical():
    rng = random.Random(7)
    for _ in range(300):
        s = "".join(rng.choice(_FRAGS) for _ in range(rng.randint(1, 25)))
        a, b = _both(s)
        assert a == b, repr(s[:200])


@settings(max_examples=80, deadline=None)
@given(st.lists(st.sampled_from(_FRAGS) | st.text(max_size=30), max_size=30)
       .map("".join))
def test_hypothesis_soups_identical(s):
    a, b = _both(s)
    assert a == b


def test_uppercase_attr_names_identical():
    """html.parser lowercases attribute names, so Class=/ID=/ALT= must
    drive chrome/caption logic identically in the fast engine (its
    substring prefilter was case-sensitive — review-found)."""
    cases = (
        '<div Class="footer">chrome text here</div><p>body</p>',
        "<span ID=sidebar>s</span><p>b</p>",
        '<figure><img ALT="Kata"><figcaption>c</figcaption></figure>',
        '<DIV CLASS="nav menu">m</DIV><p>x</p>',
    )
    for s in cases:
        a, b = _both(s)
        assert a == b, repr(s)
    fast = segment_blocks(
        '<div Class="footer">chrome</div><p>body text</p>', engine="fast"
    )
    assert any(bl.chrome_class for bl in fast)


def test_unclosed_anchor_releases_anchor_state():
    """An unclosed <a> swept by an outer close tag must not poison every
    later block's link density (review-found anchor_depth leak)."""
    html = (
        "<p>First paragraph of real body text.</p>"
        '<p><a href="/y">about us</a then broken</p>'
        "<div>Plain body section one with several words.</div>"
        "<div>Plain body section two with several words.</div>"
    )
    for engine in ("fast", "stdlib"):
        blocks = segment_blocks(html, engine=engine)
        tail = [b for b in blocks if b.text.startswith("Plain body")]
        assert len(tail) == 2, engine
        assert all(b.n_anchor_chars == 0 for b in tail), engine
