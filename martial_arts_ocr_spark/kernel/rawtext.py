"""Regex-fallback whole-document extractor — the third A2 ladder rung.

Reference analogue: the PSM-variant candidate ladder
(``/root/reference/src/martial_arts_ocr/ocr/engines.py:119-168`` scores
PSM {11,3,6} / {8,6} variants per region and keeps the best by
``candidate_score``). The web graft's ladder is:

    1. consensus block extraction   (prior 0.8)
    2. full-page non-chrome blocks  (prior 0.5)  — P3 fallback
    3. THIS: tag-stripping regex    (prior 0.3)  — last-resort salvage

Rung 3 ignores DOM structure entirely: strip comments, skip-subtrees, and
tags, decode entities, keep non-empty lines. It loses reading-order and
block metadata but survives tag soup that defeats the block parser (e.g.
an unclosed <object> swallowing the document), exactly like full-page
PSM-3 OCR survives layouts that defeat region segmentation.
"""

from __future__ import annotations

import re
from html import unescape

_COMMENT_RE = re.compile(r"<!--.*?(?:-->|\Z)", re.S)
# only script/style consume their content here (it is code, not text);
# noscript/template/iframe/object get plain tag-stripping — an UNCLOSED
# one of those swallows the whole document in the block parser but leaves
# its text recoverable here, which is exactly the salvage this rung adds
_SKIP_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?(?:</\1\s*>|\Z)",
    re.I | re.S,
)
_TAG_RE = re.compile(r"<[^>]*>")
_SPACE_RE = re.compile(r"[ \t\r\f\v]+")


def extract_rawtext(html_text: str) -> str:
    """Whole-document text with no DOM analysis; '' when nothing found."""
    t = _COMMENT_RE.sub(" ", html_text)
    t = _SKIP_RE.sub(" ", t)
    t = _TAG_RE.sub("\n", t)
    if "&" in t:
        t = unescape(t)
    lines = (_SPACE_RE.sub(" ", ln).strip() for ln in t.split("\n"))
    return "\n".join(ln for ln in lines if ln)
