"""Property-based robustness: the kernel never raises, is deterministic,
and respects the truncation guard — on arbitrary byte/tag-soup inputs.

hypothesis settings kept small so the suite stays fast; the properties are
the reference's degradation discipline (every failure is a status, never an
exception — orchestrator.py:289-311) applied to adversarial input.
"""

from hypothesis import given, settings, strategies as st

from martial_arts_ocr_spark.kernel.cleanup import clean_text
from martial_arts_ocr_spark.kernel.pipeline import MAX_HTML_BYTES, extract_document

_tags = st.sampled_from(
    ["<p>", "</p>", "<div>", "</div>", "<a href='x'>", "</a>", "<br>",
     "<script>", "</script>", "<figure>", "</figcaption>", "<nav>", "<b>",
     "<li>", "</ul>", "<meta charset='utf-8'>", "<!--", "-->", "<![CDATA[",
     "<h1>", "</h2>", "<table>", "<td>",
     "<iframe/>", "<script/>", "<object>", "<noscript/>", "</object>"]
)
_texts = st.text(max_size=80)
_soup = st.lists(st.one_of(_tags, _texts), max_size=40).map("".join)


@settings(max_examples=60, deadline=None)
@given(_soup)
def test_kernel_never_raises_on_tag_soup(soup):
    row = extract_document("https://fuzz.test/x", soup.encode("utf-8"))
    assert row["status"] in ("completed", "failed")
    # determinism: repeated call byte-identical
    again = extract_document("https://fuzz.test/x", soup.encode("utf-8"))
    assert row == again


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=4096))
def test_kernel_never_raises_on_random_bytes(data):
    row = extract_document("https://fuzz.test/b", data)
    assert row["status"] in ("completed", "failed")


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=400))
def test_cleanup_chain_total_and_idempotent_shape(text):
    out = clean_text(text)
    assert isinstance(out, str)
    # chain is idempotent on its own output for whitespace/control classes
    assert clean_text(out) == clean_text(clean_text(out))


def test_truncation_guard():
    big = b"<p>" + b"a" * (MAX_HTML_BYTES + 1000)
    row = extract_document("https://fuzz.test/big", big)
    assert row["status"] == "completed"
    assert row["error"] == "truncated_input"
    assert len(row["text"]) <= MAX_HTML_BYTES


def test_deep_nesting_no_recursion_error():
    html = ("<div>" * 4000 + "deep text content here" + "</div>" * 4000)
    row = extract_document("https://fuzz.test/deep", html.encode())
    assert row["status"] == "completed"
    assert "deep text content here" in row["text"]


def test_adversarial_floods_are_linear():
    """Flood inputs that used to trigger O(n^2) rescans (unclosed-comment
    floods: full tail re-search per occurrence; 50k-deep nesting: quadratic
    node_path growth) must stay well under a second of work each — bound is
    generous for host noise, the broken versions took 11-120 s."""
    import time

    from martial_arts_ocr_spark.kernel.html_blocks import segment_blocks

    cases = [
        "<!--" * 30000,
        "<div>" * 50000 + "x",
        "<![CDATA[" + "]" * 100000,
        "<?x" * 50000,
        "</a " * 50000,
    ]
    for s in cases:
        t0 = time.perf_counter()
        segment_blocks(s, engine="fast")
        assert time.perf_counter() - t0 < 5.0, s[:30]


def test_pipeline_2mb_floods_bounded():
    """Full extract_document on 2 MiB (= MAX_HTML_BYTES) adversarial pages
    must stay bounded — the `cur.text +=` attribute-concat path was
    O(n²) (60 s on a comment flood) before parts-list accumulation."""
    import time

    from martial_arts_ocr_spark.kernel.pipeline import extract_document

    for blob in (b"<!--" * 524288,
                 b"<div>" + b"<b>x</b>" * 262144 + b"</div>",
                 b"<div>" + b" Share |" * 262100 + b" x</div>"):
        t0 = time.perf_counter()
        r = extract_document("https://x.test/flood", blob)
        assert r["status"] in ("completed", "failed")
        assert time.perf_counter() - t0 < 15.0
