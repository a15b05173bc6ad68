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

# start/end tag patterns; comments/CDATA/decls/PIs are handled by direct
# substring scans (first-char dispatch — see tokenize_into). Semantics are
# identical to the previous single-alternation token regex; equivalence with
# stdlib html.parser stays pinned by tests/test_fast_html_equivalence.py.
_OPEN_RE = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9:._-]*)"
    r"((?:\s+[^<>\s\"'][^<>\s=]*(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s>]*))?)*)"
    r"\s*(/)?>"
)
_CLOSE_RE = re.compile(r"</([a-zA-Z][a-zA-Z0-9:._-]*)\s*>")

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
    find = html_text.find
    handle_data = handler.handle_data
    handle_starttag = handler.handle_starttag
    handle_endtag = handler.handle_endtag
    open_match = _OPEN_RE.match
    close_match = _CLOSE_RE.match
    while pos < n:
        lt = find("<", pos)
        if lt == -1:
            data = html_text[pos:]
            if data:
                handle_data(unescape(data) if "&" in data else data)
            break
        if lt > pos:
            data = html_text[pos:lt]
            handle_data(unescape(data) if "&" in data else data)
        c = html_text[lt + 1] if lt + 1 < n else ""
        if c.isalpha():                       # start tag
            m = open_match(html_text, lt)
            if m is None:
                handle_data("<")
                pos = lt + 1
                continue
            tag = m.group(1).lower()
            raw_attrs = m.group(2)
            attrs = (
                _parse_attrs(raw_attrs)
                if raw_attrs and any(k in raw_attrs for k in _INTERESTING)
                else []
            )
            if m.group(3):
                handler.handle_startendtag(tag, attrs)
            else:
                handle_starttag(tag, attrs)
                if tag in ("script", "style"):
                    # rawtext elements (html.parser CDATA mode): content is
                    # not tokenized; scan straight to the closing tag
                    end = _RAWTEXT_END[tag].search(html_text, m.end())
                    if end is None:
                        handle_endtag(tag)
                        break
                    handle_endtag(tag)
                    pos = end.end()
                    continue
            pos = m.end()
        elif c == "/":                        # end tag
            m = close_match(html_text, lt)
            if m is None:
                handle_data("<")
                pos = lt + 1
                continue
            handle_endtag(m.group(1).lower())
            pos = m.end()
        elif c == "!":                        # comment / CDATA / decl
            if html_text.startswith("<!--", lt):
                i = find("-->", lt + 4)
                pos = i + 3 if i != -1 else n
            elif html_text.startswith("<![CDATA[", lt):
                i = find("]]>", lt + 9)
                pos = i + 3 if i != -1 else n
            else:
                i = find(">", lt + 2)
                if i == -1:                   # '<!' with no '>' → literal '<'
                    handle_data("<")
                    pos = lt + 1
                else:
                    pos = i + 1
        elif c == "?":                        # processing instruction
            i = find(">", lt + 2)
            if i == -1:
                handle_data("<")
                pos = lt + 1
            else:
                pos = i + 1
        else:                                 # literal '<'
            handle_data("<")
            pos = lt + 1
