"""Extractor B — DOM-tree structural classifier.

The second engine of the dual-engine consensus design (reference: EasyOCR as
second OCR engine, ``/root/reference/src/martial_arts_ocr/ocr/engines.py``;
pluggable model strategies ``strategies/paddle_layout.py:14-26``): classifies
each block purely from DOM structure — tag semantics, chrome ancestry,
class/id markers, sibling regularity (link-farm shape, the analogue of the
sibling-panel detector ``detectors/multi_figure_rows.py:31-120``).

Same output protocol as extractor A (:class:`~.density.Verdict`) so the two
are swappable — mirroring the reference's ``detect(image) ->
LayoutDetectionResult`` strategy protocol.
"""

from __future__ import annotations

from .density import Verdict
from .html_blocks import Block

CONTENT_TAGS = {"p", "blockquote", "pre", "article", "figcaption", "caption"}
HEADING_CONF = 0.90   # reference FigureDetector emits fixed conf 0.90 (figure.py:118)


def _sibling_link_farms(blocks: list[Block]) -> set[str]:
    """Parents whose repeated same-signature children are link-dominated.

    Sibling-panel rule (multi_figure_rows.py: keep bands with ≥2 structurally
    equal siblings) inverted for boilerplate: ≥3 same-signature siblings with
    mean link density > 0.5 mark the whole parent as a link farm.
    """
    groups: dict[tuple[str, str], list[Block]] = {}
    for b in blocks:
        groups.setdefault((b.parent_path, b.sibling_sig), []).append(b)
    farms: set[str] = set()
    for (parent, _sig), sibs in groups.items():
        if len(sibs) >= 3:
            mean_ld = sum(s.link_density for s in sibs) / len(sibs)
            mean_len = sum(s.n_chars for s in sibs) / len(sibs)
            if mean_ld > 0.5 and mean_len < 120:
                farms.add(parent)
    return farms


def classify_blocks(blocks: list[Block]) -> list[Verdict]:
    """Structural verdict per block, in document order."""
    farms = _sibling_link_farms(blocks)
    out: list[Verdict] = []
    for b in blocks:
        reasons: list[str] = []
        if b.in_chrome_tag:
            reasons.append("chrome_ancestor")
        if b.chrome_class:
            reasons.append("chrome_class")
        if b.parent_path in farms:
            reasons.append("sibling_link_farm")
        if reasons:
            out.append(Verdict(False, 0.9, tuple(reasons)))
            continue
        if b.is_heading:
            out.append(Verdict(True, HEADING_CONF, (), 1.0))
        elif b.tag in CONTENT_TAGS:
            out.append(Verdict(True, 0.85, (), 0.9))
        elif b.is_list_item:
            out.append(Verdict(True, 0.7, (), 0.7))
        else:
            # structurally neutral containers: weak accept
            out.append(Verdict(True, 0.55, (), 0.5))
    return out
