"""Per-document extraction pipeline — the kernel's single entry point.

Web graft of ``OCRProcessor.process_document``
(``/root/reference/src/martial_arts_ocr/ocr/processor.py:97-196``):

    decode (N1) → parse/segment blocks (D7/D9) → quick quality gate (P2) →
    dual-extractor scoring (A: density P5/D8, B: DOM tree D6) → consensus
    merge (A1/P6) → figure regions (D1/D5, M1/M2) → reading-order assembly
    (W1-W3) → cleanup chain (T1-T17) → script segments + romanization +
    terminology + macron candidates (L1-L8, J4/J5) → stats (A6/A7) → row.

Pure function ``(url, html_bytes, lang_hint) -> dict`` — deterministic,
stdlib-only; Spark wraps it in ``mapInPandas`` (engine/job.py). The P3
full-page-vs-region decision (processor.py:248-263) survives as: when ≤2
blocks were accepted or accepted coverage <20% of total text, fall back to
whole-document extraction (all non-chrome blocks) — the analogue of
full-page OCR when region OCR looks degenerate.
"""

from __future__ import annotations

from . import (assemble, cleanup, consensus, density, domtree, rawtext,
               refine, regions, romanize, script, terms)
from .encoding import decode_html
from .html_blocks import segment_blocks

# P2-style quick gate thresholds (processor.py:211-246: text<20 chars /
# <5 words → needs the heavy path / marked low quality)
MIN_DOC_CHARS = 20
MIN_DOC_WORDS = 5
# truncation guard (japanese/processor.py:322-327: inputs >100k chars are
# truncated with a flag — DoS bound on per-doc work); web pages are larger,
# so the cap is 2 MiB of html bytes
MAX_HTML_BYTES = 2 * 1024 * 1024
# P3 thresholds (processor.py:248-263: ≤2 regions or <20% coverage)
FALLBACK_MIN_BLOCKS = 2
FALLBACK_MIN_COVERAGE = 0.20

# empty-input stat shapes computed once (they were ~5% of per-doc time as
# per-call defaults; copied per row so downstream mutation stays safe)
_EMPTY_STATS = assemble.text_statistics("")
_EMPTY_CLEANING = assemble.cleaning_stats("", "")
_EMPTY_LAYOUT = assemble.layout_stats([])


def extract_document(url: str, html: bytes | None, lang_hint: str = "") -> dict:
    """Extract one document. Never raises: failures return status='failed'."""
    row: dict = {
        "url": url,
        "status": "completed",
        "error": None,
        "encoding": None,
        "n_bytes_in": len(html) if html else 0,   # pre-truncation input size
        "text": "",
        "n_blocks": 0,
        "n_rejected": 0,
        "n_review": 0,
        "n_refined": 0,
        "decision_source": "consensus",
        "reading_order_uncertain": False,
        "lang_detected": "unknown",
        "ja_ratio": 0.0,
        "is_mixed": False,
        "confidence": 0.0,
        "quality": "empty",
        "segments": [],
        "romaji": None,
        "translation": None,
        "term_hits": [],
        "macron_candidates": [],
        "figures": [],
        "stats": dict(_EMPTY_STATS),
        "cleaning": dict(_EMPTY_CLEANING),
        "layout": dict(_EMPTY_LAYOUT),
        "language_segments": [],
    }
    try:
        if not html:
            row["status"] = "failed"
            row["error"] = "empty_html"
            return row
        if len(html) > MAX_HTML_BYTES:
            html = html[:MAX_HTML_BYTES]
            row["error"] = "truncated_input"       # flagged, not failed
        html_text, enc = decode_html(html)
        row["encoding"] = enc
        blocks = segment_blocks(html_text)
        regex_text: str | None = None      # A2 ladder rung 3 result
        if not blocks:
            # last ladder rung: tag-stripping salvage (rawtext.py) — the
            # analogue of falling through the PSM ladder to full-page OCR
            regex_text = rawtext.extract_rawtext(html_text)
            if not regex_text:
                row["status"] = "failed"
                row["error"] = "no_blocks"
                return row
            row["decision_source"] = "regex"
            decisions = []
        else:
            verdict_a = [density.score_block(b) for b in blocks]
            verdict_b = domtree.classify_blocks(blocks)
            decisions = consensus.merge_blocks(blocks, verdict_a, verdict_b)

            accepted = [d for d in decisions if d.accept]
            total_chars = sum(b.n_chars for b in blocks) or 1
            acc_chars = sum(d.block.n_chars for d in accepted)
            # P3 fallback: degenerate region extraction → whole-doc ladder
            # (A2: three candidates through the same candidate_score, like
            # the reference's PSM variants, ocr/engines.py:119-168)
            if (len(accepted) <= FALLBACK_MIN_BLOCKS
                    or acc_chars / total_chars < FALLBACK_MIN_COVERAGE):
                fallback = [
                    consensus.BlockDecision(b, True, 0.5, "fullpage", True, ())
                    for b in blocks
                    if not (b.in_chrome_tag or b.chrome_class)
                ]
                text_consensus, _ = assemble.assemble_text(decisions)
                text_fallback, _ = assemble.assemble_text(fallback)
                text_regex = rawtext.extract_rawtext(html_text)
                s_cons = consensus.candidate_score(0.8, text_consensus)
                s_fall = consensus.candidate_score(0.5, text_fallback)
                s_regx = consensus.candidate_score(0.3, text_regex)
                if s_regx > s_cons and s_regx > s_fall:
                    regex_text = text_regex
                    decisions = []
                    row["decision_source"] = "regex"
                elif s_fall > s_cons:
                    decisions = fallback
                    row["decision_source"] = "fullpage"

        # M4 refinement: strip inline boilerplate tails from accepted blocks
        n_refined = 0
        for d in decisions:
            if d.accept and d.block.n_chars > 40:
                new_text, was_refined = refine.refine_text(d.block.text)
                if was_refined and new_text:
                    d.block.text = new_text
                    d.review = True
                    n_refined += 1
        row["n_refined"] = n_refined

        if regex_text is not None:
            # rung-3 output: no block structure — reading order is by
            # construction uncertain, block/figure metadata empty
            raw_text, uncertain = regex_text, True
        else:
            raw_text, uncertain = assemble.assemble_text(decisions)
        text = cleanup.clean_text(raw_text)
        row["cleaning"] = assemble.cleaning_stats(raw_text, text)   # A9
        row["layout"] = assemble.layout_stats(decisions)            # A11

        n_acc = n_rev = 0
        conf_sum = 0.0
        for d in decisions:
            if d.accept:
                n_acc += 1
                conf_sum += d.confidence
            if d.review:
                n_rev += 1
        row["n_blocks"] = n_acc
        row["n_rejected"] = len(decisions) - n_acc
        row["n_review"] = n_rev
        row["reading_order_uncertain"] = uncertain
        row["text"] = text

        # figures
        figs, _events = regions.merge_spans(regions.detect_figures(decisions))
        row["figures"] = [
            {"region_id": r.region_id, "region_type": r.region_type,
             "start": r.start, "end": r.end, "caption": r.caption,
             "confidence": r.confidence, "reading_order": r.reading_order}
            for r in figs
        ]

        # language / script path (P7 gate: skip unless Japanese present)
        comp = script.language_composition(text)
        row["language_segments"] = script.language_segments(text)   # L12
        row["ja_ratio"] = comp["ja_ratio"]
        row["is_mixed"] = comp["is_mixed"]
        row["lang_detected"] = comp["dominant"]
        ja_conf = 0.0
        if script.has_japanese(text):
            segs = script.japanese_segments(text)
            row["segments"] = [
                {"text": s.text, "script_type": s.script_type,
                 "start": s.start, "end": s.end}
                for s in segs
            ]
            row["romaji"] = romanize.overall_romaji([s.text for s in segs])
            row["translation"] = terms.overall_translation(
                [s.text for s in segs]
            )
            row["term_hits"] = [
                {"term": h.term, "romaji": h.romaji,
                 "translation": h.translation, "category": h.category,
                 "pos": h.pos}
                for h in terms.extract_terms(text)
            ]
            ja_conf = min(0.3 + 0.1 * len(segs), 0.9)
        row["macron_candidates"] = [
            {"observed": c.observed, "candidate": c.candidate,
             "start": c.start, "end": c.end, "ambiguous": c.ambiguous}
            for c in terms.find_macron_candidates(text)
        ]

        # stats + confidences (A4/A5/A6)
        stats = assemble.text_statistics(text)
        row["stats"] = stats
        mean_conf = conf_sum / n_acc if n_acc else 0.0
        # A4: overall = 0.7·extraction + 0.3·japanese, capped 1.0
        # (processor.py:376-390)
        row["confidence"] = round(min(0.7 * mean_conf + 0.3 * ja_conf
                                      if ja_conf else mean_conf, 1.0), 6)
        # A5 staircase (processor.py:392-414 shape)
        if stats["n_chars"] < MIN_DOC_CHARS or stats["n_words"] < MIN_DOC_WORDS:
            row["quality"] = "low"
        elif row["confidence"] >= 0.8 and stats["n_words"] >= 50:
            row["quality"] = "high"
        else:
            row["quality"] = "medium"
        return row
    except Exception as exc:  # never fail the batch (orchestrator.py:289-311)
        row["status"] = "failed"
        row["error"] = f"{type(exc).__name__}: {exc}"[:500]
        return row
