"""Dual-extractor consensus merge.

Grafts two reference mechanisms:

* best-result arg-max selection (``/root/reference/src/martial_arts_ocr/ocr/
  processor.py:313-345``): score = 0.5·confidence + 0.2·[len>100] +
  0.1·[10<words<1000]; highest wins — used here to arbitrate whole-document
  disagreements between the two extractors;
* the OCR-aware three-band overlap decision (``utils/image/layout/filters/
  text_filter.py:277-317 _ocr_aware_decision``; thresholds
  ``options.py:62-68``): high agreement ≥0.60 → decide outright, moderate
  ≥0.25 → flag for review, low ≤0.10 → accept — re-expressed over extractor
  disagreement per block.
"""

from __future__ import annotations

from dataclasses import dataclass

from .density import Verdict
from .html_blocks import Block

# three-band thresholds (reference options.py:62-68 uses 0.60/0.25/0.10 on
# overlap ratio; we apply the same bands to the rejecter's confidence)
HIGH_BAND = 0.60
MODERATE_BAND = 0.25


@dataclass(slots=True)
class BlockDecision:
    block: Block
    accept: bool
    confidence: float
    source: str            # "both" | "density" | "dom" | "neither"
    review: bool
    reasons: tuple[str, ...]


def candidate_score(confidence: float, text: str) -> float:
    """Reference best-result scoring (ocr/processor.py:313-345)."""
    words = text.split()
    score = 0.5 * confidence
    if len(text) > 100:
        score += 0.2
    if 10 < len(words) < 1000:
        score += 0.1
    return score


def merge_block(b: Block, a: Verdict, d: Verdict) -> BlockDecision:
    """Arbitrate one block between extractor A (density) and B (dom)."""
    if a.accept == d.accept:
        conf = round(min((a.confidence + d.confidence) / 2.0 + 0.1, 0.99), 6)
        return BlockDecision(b, a.accept, conf, "both", False,
                             a.reasons + d.reasons)
    rejecter, accepter, rej_name, acc_name = (
        (a, d, "density", "dom") if not a.accept else (d, a, "dom", "density")
    )
    # three-band arbitration on the rejecter's confidence
    if rejecter.confidence >= HIGH_BAND and accepter.confidence < 0.85:
        return BlockDecision(b, False, rejecter.confidence, rej_name, False,
                             rejecter.reasons)
    if rejecter.confidence >= MODERATE_BAND and accepter.confidence < 0.7:
        return BlockDecision(b, False, rejecter.confidence, rej_name, True,
                             rejecter.reasons + ("review",))
    return BlockDecision(b, True, accepter.confidence, acc_name, True,
                         rejecter.reasons)


def merge_blocks(
    blocks: list[Block], a: list[Verdict], d: list[Verdict]
) -> list[BlockDecision]:
    return [merge_block(b, va, vd) for b, va, vd in zip(blocks, a, d)]
