"""Ordered text-cleanup chain (web graft of the reference's two-class chain).

The reference composes ``OCRPostProcessor.clean_text``
(``/root/reference/src/martial_arts_ocr/ocr/postprocessor.py:142-188``) then
``TextCleaner.clean_text`` (``utils/text/text_utils.py:108-142``) — order is
semantics (verified by the reference's own
``tests/test_ocr_cleanup_chain.py:26-32``). This module reproduces the same
*chain shape* with web-text stages; byte-identity is pinned by our golden
fixtures exactly as the reference pins its chain with exact-string asserts.

Stage map (SURVEY.md §2.8):
  T1  NFKC normalize                       (postprocessor.py:148)
  T2  boilerplate-marker strip             (typewriter artifacts :243-257)
  T3  hyphenated line-break merge          (:289-297)
  T4  soft-wrap merge                      (:299-307)
  T5  consecutive duplicate line drop      (:312-318)
  T6  mojibake substitution map            (char_substitutions :46-66)
  T7  regex corrections                    (regex_patterns :67-107)
  T10 whitespace normalize                 (:413-432)
  T11 control-char strip                   (text_utils.py:144-153)
  T12 artifact-glyph / stray-line strip    (text_utils.py:94-97,155-166)

All stages are pure functions str→str, deterministic, stdlib-only.
"""

from __future__ import annotations

import re
import unicodedata

# ---------------------------------------------------------------------------
# T2: boilerplate markers (web analogue of typewriter-artifact indicators,
# postprocessor.py:243-257 — "if ≥2 of the indicator regexes match the first
# 500 chars, apply the artifact strip regexes").
# ---------------------------------------------------------------------------
BOILER_INDICATORS = [
    re.compile(r"cookie", re.IGNORECASE),
    re.compile(r"skip to (?:main )?content", re.IGNORECASE),
    re.compile(r"all rights reserved", re.IGNORECASE),
    re.compile(r"privacy policy", re.IGNORECASE),
    re.compile(r"subscribe", re.IGNORECASE),
]
BOILER_STRIP_RES = [
    re.compile(r"^.*accept (?:all )?cookies.*$\n?", re.IGNORECASE | re.MULTILINE),
    re.compile(r"^.*skip to (?:main )?content.*$\n?", re.IGNORECASE | re.MULTILINE),
    re.compile(r"^\s*©.*all rights reserved.*$\n?", re.IGNORECASE | re.MULTILINE),
    re.compile(r"^.*(?:privacy policy|cookie policy)\s*\|.*$\n?",
               re.IGNORECASE | re.MULTILINE),
]

# ---------------------------------------------------------------------------
# T6: mojibake/entity fix map (web analogue of char_substitutions
# postprocessor.py:46-66 — fixed, ordered, context-free replacements).
# Keys are utf-8-bytes-read-as-cp1252 artifacts; ordering = insertion order.
# ---------------------------------------------------------------------------
MOJIBAKE_MAP: dict[str, str] = {
    "â€™": "’",
    "â€˜": "‘",
    "â€œ": "“",
    "â€\x9d": "”",
    "â€“": "–",
    "â€”": "—",
    "â€¦": "…",
    "Ã©": "é",
    "Ã¨": "è",
    "Ã¼": "ü",
    "Ã¶": "ö",
    "Ã¤": "ä",
    "Ãµ": "õ",
    "Ã±": "ñ",
    "Â·": "·",
    "Â ": " ",
    "&amp;amp;": "&",
    "&amp;": "&",
    "&nbsp;": " ",
}

# ---------------------------------------------------------------------------
# T7: ordered regex corrections (web analogue of regex_patterns
# postprocessor.py:67-107 — entity remnants, spacing/punct normalization).
# ---------------------------------------------------------------------------
# (pattern, replacement, cheap-substring guard or None) — the guard is a
# literal every match must contain, letting a C-level `in` skip the regex
REGEX_CORRECTIONS: list[tuple[re.Pattern, str, str | None]] = [
    (re.compile(r"&#x?[0-9a-fA-F]{2,6};"), "", "&#"),  # unresolved numeric entities
    (re.compile(r"\[\s*(?:edit|citation needed)\s*\]", re.IGNORECASE), "", "["),
    # collapse runs — on single spaces the sub is the identity, so the
    # guard ("  " or a tab present) is exact, not approximate
    (re.compile(r"[ \t]+"), " ", None),
    (re.compile(r"\s+([.,;:!?])"), r"\1", None),        # no space before punct
    (re.compile(r"([.,;:!?])\1+"), r"\1", None),        # dedup punct
]

# T11: control chars except \n \t (text_utils.py:144-153)
_CTRL_RE = re.compile(r"[\x00-\x08\x0b-\x1f\x7f]")
# T12: artifact glyphs (same public glyph class as text_utils.py:94)
_ARTIFACT_RE = re.compile(r"[■□▪▫◊◆◇○●△▲▼▽]")
_PUNCT_ONLY_LINE_RE = re.compile(r"^[.,;:!?|·•\-–—]+\s*$", re.MULTILINE)
_ISOLATED_CHAR_LINE_RE = re.compile(r"^\s*[a-zA-Z]\s*$", re.MULTILINE)

_TERMINAL_RE = re.compile(r"[.!?:;。！？]$")


def nfkc(text: str) -> str:
    """T1 (postprocessor.py:148)."""
    return unicodedata.normalize("NFKC", text)


def strip_boilerplate_markers(text: str) -> str:
    """T2: strip marker lines iff ≥2 indicators fire in the first 500 chars,
    the same trigger shape as _looks_like_typewriter (postprocessor.py:243-257)."""
    head = text[:500]
    hits = sum(1 for rx in BOILER_INDICATORS if rx.search(head))
    if hits < 2:
        return text
    for rx in BOILER_STRIP_RES:
        text = rx.sub("", text)
    return text


def process_lines(text: str) -> str:
    """T3+T4+T5: hyphen merge, soft-wrap merge, consecutive-dup drop.

    Same algorithm shape as _process_lines (postprocessor.py:280-318):
    single forward pass; hyphen-terminated line merges with a lowercase-
    starting successor; a lowercase-starting line merges into a predecessor
    lacking a terminal; consecutive duplicates dropped last.
    """
    lines = text.split("\n")
    n = len(lines)
    # output lines kept as PART LISTS, joined once at the end: the naive
    # `prev + " " + line` / `line[:-1] + nxt` concatenations are O(total²)
    # when thousands of consecutive lines merge (a 100k-duplicate-line page
    # took 277 s within the 2 MiB input cap)
    merged: list[list[str]] = []
    carry: list[str] | None = None    # hyphen-merge prefix, hyphen removed
    i = 0
    while i < n:
        if carry:                     # extend in place: a 50k-line hyphen
            parts = carry             # chain must not copy the carry list
            parts.append(lines[i])    # per line (that is O(n²) again)
        else:
            parts = [lines[i]]
        carry = None
        while parts:                  # rstrip across parts
            s = parts[-1].rstrip()
            if s:
                parts[-1] = s
                break
            parts.pop()
        last_ch = parts[-1][-1] if parts else ""
        if last_ch == "-" and i + 1 < n:
            nxt = lines[i + 1].lstrip()
            if nxt and nxt[0].islower():
                parts[-1] = parts[-1][:-1]
                carry = parts
                lines[i + 1] = nxt
                i += 1
                continue
        # interior parts may be "" (a "-"-only line carries an empty prefix)
        first_ch = next((p[0] for p in parts if p), "")
        if merged and first_ch and first_ch.islower():
            prev = merged[-1]
            prev_last = next((p[-1] for p in reversed(prev) if p), "")
            if prev_last and not _TERMINAL_RE.match(prev_last):
                prev.append(" ")
                prev.extend(parts)
                i += 1
                continue
        merged.append(parts)
        i += 1
    deduped: list[str] = []
    for parts in merged:
        line = "".join(parts)
        if not deduped or line != deduped[-1]:
            deduped.append(line)
    return "\n".join(deduped)


# every MOJIBAKE_MAP key contains one of these lead chars — 4 C-scans
# decide whether the 19-key substitution loop can run at all
_MOJIBAKE_LEADS = ("â", "Ã", "Â", "&")


def fix_mojibake(text: str) -> str:
    """T6: ordered context-free substitution map."""
    if not any(c in text for c in _MOJIBAKE_LEADS):
        return text
    for wrong, right in MOJIBAKE_MAP.items():
        if wrong in text:
            text = text.replace(wrong, right)
    return text


def apply_regex_corrections(text: str) -> str:
    """T7: ordered regex chain."""
    for rx, repl, guard in REGEX_CORRECTIONS:
        if guard is None or guard in text:
            if repl == " " and "  " not in text and "\t" not in text:
                continue                    # run-collapse is identity here
            text = rx.sub(repl, text)
    return text


def strip_control_chars(text: str) -> str:
    """T11 (text_utils.py:144-153): drop ord<32 except \\n and \\t."""
    return _CTRL_RE.sub("", text)


def strip_artifacts(text: str) -> str:
    """T12: artifact glyphs, punctuation-only lines, isolated char lines."""
    if not text.isascii():                  # glyph class is all non-ASCII
        text = _ARTIFACT_RE.sub("", text)
    text = _PUNCT_ONLY_LINE_RE.sub("", text)
    text = _ISOLATED_CHAR_LINE_RE.sub("", text)
    return text


def normalize_whitespace(text: str) -> str:
    """T10 (postprocessor.py:413-432): collapse spaces, normalize line ends,
    ≤1 blank line, strip per-line trailing space, final strip."""
    if "\r" in text:
        text = text.replace("\r\n", "\n").replace("\r", "\n")
    # each sub below is the identity unless its guard substring exists,
    # so the guards are exact skips, not approximations
    if "  " in text or "\t" in text:
        text = re.sub(r"[ \t]+", " ", text)
    if " \n" in text or "\n " in text:
        text = re.sub(r" ?\n ?", "\n", text)
    if "\n\n\n" in text:
        text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip()


def clean_text(text: str) -> str:
    """The full ordered chain — order is semantics, do not reorder.

    Chain order mirrors OCRPostProcessor.clean_text (postprocessor.py:142-188)
    steps 1→7 with web-stage analogues.
    """
    if not text:
        return text
    text = strip_control_chars(text)       # T11 first: bytes hygiene
    text = nfkc(text)                      # T1
    text = fix_mojibake(text)              # T6 (before marker matching)
    text = strip_boilerplate_markers(text) # T2
    text = process_lines(text)             # T3/T4/T5
    text = strip_artifacts(text)           # T12
    text = apply_regex_corrections(text)   # T7
    text = normalize_whitespace(text)      # T10
    return text
