"""Reading-order assembly + text statistics.

Grafts the reference's page reconstruction ladder:
* reading-order sort (``/root/reference/src/martial_arts_ocr/reconstruction/
  page_reconstructor.py:605-608``) — DOM order, i.e. char-span start, with a
  full deterministic tie-break (start, end, block_id) per SURVEY §7.0;
* readable-text assembly (``pipeline/text_normalization.py:82-93``) — blocks
  joined with '\\n' (headings/paragraphs get a blank line, the analogue of
  PageResult.combined_text's '\\n\\n' page join, document_models.py:162-163);
* reading-order-uncertain flag (``text_normalization.py:227-238``) — fires
  when consensus forced review on ≥1 block (the span analogue of the
  "too-large gap" rule);
* element classification R2 (``page_reconstructor.py:551-567``): heading if
  <100 chars and (ALL-CAPS or CHAPTER/SECTION/PART prefix or ends ':').
* text statistics A6 (``utils/text/text_utils.py:392-427``).
"""

from __future__ import annotations

import re

from .consensus import BlockDecision

_SENT_RE = re.compile(r"[.!?。！？]+")
_HEADING_PREFIX_RE = re.compile(r"^(?:CHAPTER|SECTION|PART)\b", re.IGNORECASE)


def classify_element(text: str, tag: str) -> str:
    """R2: tag is ground truth in the DOM world; the reference's textual
    classifier is kept for consensus on neutral containers."""
    if tag in {"h1", "h2", "h3", "h4", "h5", "h6", "title"}:
        return "heading"
    if len(text) < 100 and (
        (text.isupper() and any(c.isalpha() for c in text))
        or _HEADING_PREFIX_RE.match(text)
        or text.endswith(":")
    ):
        return "heading"
    if tag in {"li", "dt", "dd"}:
        return "list_item"
    if len(text) < 50:
        return "text"
    return "paragraph"


def assemble_text(decisions: list[BlockDecision]) -> tuple[str, bool]:
    """Join accepted blocks in reading order → (text, uncertain_flag).

    Deterministic: blocks sorted by (start, end, block_id); paragraphs and
    headings separated by a blank line, list items by a single newline
    (mirrors the line-vs-paragraph join split in the reference: regions '\\n'
    within a page, '\\n\\n' between pages).
    """
    accepted = sorted(
        (d for d in decisions if d.accept),
        key=lambda d: (d.block.start, d.block.end, d.block.block_id),
    )
    parts: list[str] = []
    prev_list = False
    for d in accepted:
        etype = classify_element(d.block.text, d.block.tag)
        is_list = etype == "list_item"
        if parts:
            parts.append("\n" if (is_list and prev_list) else "\n\n")
        parts.append(d.block.text)
        prev_list = is_list
    uncertain = any(d.review for d in decisions)
    return "".join(parts), uncertain


def cleaning_stats(original: str, cleaned: str) -> dict:
    """A9 (utils/text/text_utils.py:48-71,108-142): before/after sizes and
    compression ratio of the cleanup chain."""
    wb, wa = len(original.split()), len(cleaned.split())
    return {
        "original_chars": len(original),
        "cleaned_chars": len(cleaned),
        "chars_removed": len(original) - len(cleaned),
        "words_before": wb,
        "words_after": wa,
        "compression_ratio": round(len(cleaned) / len(original), 6)
        if original else 1.0,
    }


def layout_stats(decisions) -> dict:
    """A11 (utils/image/layout/analyzer.py:367-402): block counts and
    coverage fractions — the char-span analogue of page-area coverage."""
    total = acc = fig = chrome = n_accepted = n_figure = 0
    for d in decisions:                    # single pass over the decisions
        b = d.block
        n = len(b.text)
        total += n
        if d.accept:
            acc += n
            n_accepted += 1
        if b.is_figure:
            fig += n
            n_figure += 1
        if b.in_chrome_tag or b.chrome_class:
            chrome += n
    return {
        "n_blocks_total": len(decisions),
        "n_accepted": n_accepted,
        "n_figure_blocks": n_figure,
        "content_coverage": round(acc / total, 6) if total else 0.0,
        "figure_coverage": round(fig / total, 6) if total else 0.0,
        "chrome_coverage": round(chrome / total, 6) if total else 0.0,
    }


def text_statistics(text: str) -> dict:
    """A6 (text_utils.py:392-427): chars/words/lines/sentences/paragraphs +
    avg word length + reading time (200 wpm, reference constant)."""
    words = text.split()
    lines = [ln for ln in text.split("\n") if ln.strip()]
    paragraphs = [p for p in text.split("\n\n") if p.strip()]
    sentences = [s for s in _SENT_RE.split(text) if s.strip()]
    n_words = len(words)
    return {
        "n_chars": len(text),
        "n_words": n_words,
        "n_lines": len(lines),
        "n_paragraphs": len(paragraphs),
        "n_sentences": len(sentences),
        "avg_word_len": round(sum(len(w) for w in words) / n_words, 6) if n_words else 0.0,
        "reading_time_min": round(n_words / 200.0, 6),
    }
