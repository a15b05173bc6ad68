"""Byte→str decoding with charset detection.

Web analogue of the reference's coarse-orientation scoring
(``/root/reference/utils/image/preprocessing/orientation.py:119-360``): the
reference scores 4 rotation candidates and picks the best; we score decode
candidates (declared charset, utf-8, latin-1, cp1252) and pick the best by a
deterministic penalty function (replacement chars + mojibake markers), the
web "orientation" of a byte stream.
"""

from __future__ import annotations

import re

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)

# Mojibake marker strings that appear when utf-8 bytes are decoded as
# latin-1/cp1252 ("Ã©", "â€™", ...) or when cp1252 punctuation is decoded
# as latin-1 control chars.
_MOJIBAKE_RE = re.compile("[\u00c3\u00e2][\u0080-\u00bf]|\ufffd")
_CTRL_RE = re.compile("[\u0080-\u009f]")

_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "iso-8859-1": "latin-1",
    "latin1": "latin-1",
    "latin-1": "latin-1",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "us-ascii": "ascii",
    "ascii": "ascii",
}


def declared_charset(html: bytes) -> str | None:
    """Charset from a ``<meta charset=...>`` in the first 2048 bytes.

    Any codec Python knows is honored (review-found: the old western-only
    alias whitelist silently dropped declared shift_jis/euc-jp, decoding
    Japanese pages as latin-1 mojibake and destroying the ja pipeline);
    the alias table only canonicalizes common spellings, and an unknown
    name returns None so the candidate loop falls back deterministically.
    """
    m = _META_CHARSET_RE.search(html[:2048])
    if not m:
        return None
    name = m.group(1).decode("ascii", "replace").lower()
    canon = _ALIASES.get(name)
    if canon:
        return canon
    import codecs

    try:
        codecs.lookup(name)
    except LookupError:
        return None
    return name


def _penalty(text: str) -> int:
    """Deterministic badness score for a decode candidate."""
    return (
        text.count("�") * 10
        + len(_MOJIBAKE_RE.findall(text)) * 3
        + len(_CTRL_RE.findall(text))
    )


def decode_html(html: bytes) -> tuple[str, str]:
    """Decode raw page bytes; return ``(text, chosen_encoding)``.

    Candidate order is deterministic: declared charset first, then utf-8,
    cp1252, latin-1. Lowest penalty wins; ties break by candidate order.
    """
    if not html:
        return "", "utf-8"
    candidates: list[str] = []
    decl = declared_charset(html)
    if decl:
        candidates.append(decl)
    for enc in ("utf-8", "cp1252", "latin-1"):
        if enc not in candidates:
            candidates.append(enc)

    best_text, best_enc, best_pen = None, "utf-8", None
    for enc in candidates:
        try:
            text = html.decode(enc, errors="replace")
        except LookupError:
            continue
        pen = _penalty(text)
        if best_pen is None or pen < best_pen:
            best_text, best_enc, best_pen = text, enc, pen
        if pen == 0:
            break
    return best_text if best_text is not None else "", best_enc
