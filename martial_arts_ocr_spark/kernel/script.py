"""Japanese script detection / segmentation / classification.

Reference semantics (SURVEY.md §2.9 L1-L3):
* detection ranges — the reference uses slightly different sets per module
  (``ocr/processor.py:311`` vs ``japanese/processor.py:133-136`` vs
  ``utils/text/text_utils.py:100-106``); per SURVEY §7.0 we standardize on
  ONE documented set = the text_utils ranges: Hiragana U+3040-309F, Katakana
  U+30A0-30FF, Kanji U+4E00-9FFF + Extension A U+3400-4DBF, half-width
  Katakana U+FF65-FF9F.
* segment extraction — ``finditer`` of a contiguous-run pattern emitting
  (text, start, end) spans (``japanese/processor.py:394-416``).
* script-type classification by per-class counts → one of
  {hiragana, katakana, kanji, mixed, unknown} (``processor.py:504-531``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

HIRAGANA = r"぀-ゟ"
KATAKANA = r"゠-ヿ"
KANJI = r"一-鿿㐀-䶿"
HALFWIDTH = r"･-ﾟ"

JA_CLASS = f"[{HIRAGANA}{KATAKANA}{KANJI}{HALFWIDTH}]"
# contiguous Japanese run; interior ASCII punctuation does not join runs
_JA_RUN_RE = re.compile(f"{JA_CLASS}+(?:[・ー、。「」]*{JA_CLASS}+)*")
_HIRA_RE = re.compile(f"[{HIRAGANA}]")
_KATA_RE = re.compile(f"[{KATAKANA}]")
_KANJI_RE = re.compile(f"[{KANJI}]")
_JA_ANY_RE = re.compile(JA_CLASS)
_EN_RE = re.compile(r"[A-Za-z]")

# ASCII translate-delete table keeping only [A-Za-z]; len(translate(...))
# equals len(_EN_RE.findall(...)) on ASCII text by construction
_ASCII_NONLETTER_DEL = {
    i: None for i in range(128) if not _EN_RE.match(chr(i))
}


@dataclass(frozen=True)
class ScriptSegment:
    """Web analogue of JapaneseTextSegment (japanese/processor.py:42-70)."""

    text: str
    script_type: str        # hiragana | katakana | kanji | mixed
    start: int
    end: int


def has_japanese(text: str) -> bool:
    """L1 detection gate (ocr/processor.py:309-311 analogue). The ja char
    classes are entirely non-ASCII, so pure-ASCII text short-circuits at
    C speed."""
    return (not text.isascii()) and bool(_JA_ANY_RE.search(text))


def classify_script(text: str) -> str:
    """L3 (japanese/processor.py:504-531): majority class, 'mixed' when
    no single class dominates ≥70% of Japanese chars."""
    h = len(_HIRA_RE.findall(text))
    k = len(_KATA_RE.findall(text))
    j = len(_KANJI_RE.findall(text))
    total = h + k + j
    if total == 0:
        return "unknown"
    best, name = max((h, "hiragana"), (k, "katakana"), (j, "kanji"))
    return name if best / total >= 0.7 else "mixed"


def japanese_segments(text: str) -> list[ScriptSegment]:
    """L2 (japanese/processor.py:394-416): contiguous ja runs with spans."""
    return [
        ScriptSegment(m.group(0), classify_script(m.group(0)),
                      m.start(), m.end())
        for m in _JA_RUN_RE.finditer(text)
    ]


def language_segments(text: str) -> list[dict]:
    """L12 (utils/text/text_utils.py:222-295): ja runs split the text into
    alternating en/ja spans; non-ja spans are labeled by their own content
    ('en' if any Latin letters, else 'other'). Spans cover the whole text.
    """
    if text.isascii():                      # no ja runs possible
        if text and text.strip():
            lang = "en" if _EN_RE.search(text) else "other"
            return [{"lang": lang, "start": 0, "end": len(text)}]
        return []
    segs: list[dict] = []
    pos = 0
    for m in _JA_RUN_RE.finditer(text):
        if m.start() > pos:
            chunk = text[pos:m.start()]
            if chunk.strip():
                lang = "en" if _EN_RE.search(chunk) else "other"
                segs.append({"lang": lang, "start": pos, "end": m.start()})
        segs.append({"lang": "ja", "start": m.start(), "end": m.end()})
        pos = m.end()
    if pos < len(text) and text[pos:].strip():
        chunk = text[pos:]
        lang = "en" if _EN_RE.search(chunk) else "other"
        segs.append({"lang": lang, "start": pos, "end": len(text)})
    return segs


def language_composition(text: str) -> dict:
    """A7 (japanese/processor.py:1069-1097): char-class ratios + dominance.

    is_mixed uses the reference's open interval 0.1 < ja_ratio < 0.9.
    """
    n = len(text)
    if text.isascii():
        ja = 0            # ja classes are entirely non-ASCII
        # C-level count of [A-Za-z]: delete every other ASCII ordinal
        en = len(text.translate(_ASCII_NONLETTER_DEL))
    else:
        ja = len(_JA_ANY_RE.findall(text))
        en = len(_EN_RE.findall(text))
    scriptful = ja + en
    ja_ratio = (ja / scriptful) if scriptful else 0.0
    dominant = "unknown"
    if scriptful:
        dominant = "ja" if ja_ratio >= 0.5 else "en"
    return {
        "n_chars": n,
        "ja_chars": ja,
        "en_chars": en,
        "ja_ratio": round(ja_ratio, 6),
        "dominant": dominant,
        "is_mixed": 0.1 < ja_ratio < 0.9,
    }
