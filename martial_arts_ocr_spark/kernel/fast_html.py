"""Fast HTML tokenizer — drop-in driver for the block segmenter.

``html.parser``'s generic tokenizer is ~40% of kernel time. This module
tokenizes with one compiled regex and drives the SAME ``_BlockParser``
handlers (html_blocks.py), so all block/chrome/figure semantics live in
exactly one place. Selection via ``segment_blocks(..., engine=...)`` or the
``SPARK_GRAFT_HTML_ENGINE`` env var; equivalence with the stdlib path is
enforced by an A/B test over fixtures + fuzz corpora
(tests/test_fast_html_equivalence.py).

Behaviors replicated from html.parser (convert_charrefs=True):
* charrefs decoded in text data and attribute values;
* comments / CDATA / processing instructions / doctype skipped;
* ``<`` that does not open a valid construct is literal text;
* attribute parsing: double/single/unquoted values, valueless attrs.
"""

from __future__ import annotations

import re
from html import unescape

# one pass: comments, CDATA, <!...>, <?...>, end tags, start tags
_TOKEN_RE = re.compile(
    r"<(?:"
    r"!--(?P<comment>.*?)(?:-->|\Z)"
    r"|!\[CDATA\[.*?(?:\]\]>|\Z)"
    r"|!(?P<decl>[^>]*)>"
    r"|\?(?P<pi>[^>]*)>"
    r"|(?P<close>/)(?P<ctag>[a-zA-Z][a-zA-Z0-9:._-]*)\s*>"
    r"|(?P<otag>[a-zA-Z][a-zA-Z0-9:._-]*)"
    r"(?P<attrs>(?:\s+[^<>\s\"'][^<>\s=]*(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s>]*))?)*)"
    r"\s*(?P<selfclose>/)?>"
    r")",
    re.S,
)

_ATTR_RE = re.compile(
    r"([^<>\s\"'][^<>\s=]*)(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]*)))?"
)

# only these attributes influence segmentation — skip attr parsing unless
# the raw attr string can contain one (cheap substring prefilter)
_INTERESTING = ("class", "id", "alt")

_RAWTEXT_END = {
    "script": re.compile(r"</script\s*>", re.I),
    "style": re.compile(r"</style\s*>", re.I),
}


def _parse_attrs(raw: str) -> list[tuple[str, str | None]]:
    out = []
    for m in _ATTR_RE.finditer(raw):
        name = m.group(1).lower()
        val = m.group(2) or m.group(3) or m.group(4)
        if val is not None and "&" in val:
            val = unescape(val)
        out.append((name, val))
    return out


def tokenize_into(handler, html_text: str) -> None:
    """Feed start/end/data events into a _BlockParser-compatible handler."""
    pos = 0
    n = len(html_text)
    while pos < n:
        lt = html_text.find("<", pos)
        if lt == -1:
            data = html_text[pos:]
            if data:
                handler.handle_data(unescape(data) if "&" in data else data)
            break
        if lt > pos:
            data = html_text[pos:lt]
            handler.handle_data(unescape(data) if "&" in data else data)
        m = _TOKEN_RE.match(html_text, lt)
        if m is None:
            # literal '<' that opens nothing parseable
            handler.handle_data("<")
            pos = lt + 1
            continue
        if m.group("otag"):
            tag = m.group("otag").lower()
            raw_attrs = m.group("attrs") or ""
            attrs = (
                _parse_attrs(raw_attrs)
                if raw_attrs and any(k in raw_attrs for k in _INTERESTING)
                else []
            )
            if m.group("selfclose"):
                handler.handle_startendtag(tag, attrs)
            else:
                handler.handle_starttag(tag, attrs)
                if tag in ("script", "style"):
                    # rawtext elements (html.parser CDATA mode): content is
                    # not tokenized; scan straight to the closing tag
                    end = _RAWTEXT_END[tag].search(html_text, m.end())
                    if end is None:
                        handler.handle_endtag(tag)
                        break
                    handler.handle_endtag(tag)
                    pos = end.end()
                    continue
        elif m.group("close"):
            handler.handle_endtag(m.group("ctag").lower())
        # comments / CDATA / decls / PIs: skipped
        pos = m.end()
