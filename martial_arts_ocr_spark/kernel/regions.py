"""Figure/region operators: detection, interval merge, consolidation.

Grafts of the reference's region post-processing:
* figure regions (``detectors/figure.py:51-121``): DOM-anchored — any
  accepted ``figure/table/svg`` subtree emits an image-region row with
  fixed confidence 0.90 (the reference's constant, figure.py:118), caption
  from figcaption/alt;
* sibling-panel rows (``detectors/multi_figure_rows.py``): ≥2 same-signature
  figure siblings under one parent are tagged ``panel_row``;
* span interval merge M1 (``post/merge.py:21-94 merge_overlapping``):
  fixed-point merge of overlapping / near-adjacent char spans (gap ≤ 12
  chars, the reference's 12px gap) → spanning region;
* consolidation M2 (``post/merge.py:97-234``): containment suppression —
  a region contained ≥85% inside a parent ≤5× its size is suppressed;
  every action emits an event (for the metrics/lineage table).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .consensus import BlockDecision

FIGURE_CONF = 0.90          # figure.py:118
MERGE_GAP = 12              # post/merge.py gap≤12 (px → chars)
CONTAIN_RATIO = 0.85        # post/merge.py:97-234
CONTAIN_PARENT_MAX = 5.0


@dataclass
class Region:
    region_id: int
    region_type: str        # "figure" | "table" | "panel_row"
    start: int
    end: int
    caption: str
    confidence: float
    reading_order: int = 0


@dataclass
class ConsolidationEvent:
    action: str             # "merge" | "suppress_contained"
    kept_id: int
    dropped_id: int


def detect_figures(decisions: list[BlockDecision]) -> list[Region]:
    """Figure-anchored region proposal; one region per ACCEPTED figure-ish
    block — a rejected chrome table must not emit a region whose span
    points into text that was dropped from the output (review-found)."""
    regions: list[Region] = []
    rid = 0
    sig_groups: dict[tuple[str, str], int] = {}
    for d in decisions:
        b = d.block
        if not b.is_figure or not d.accept:
            continue
        key = (b.parent_path, b.sibling_sig)
        sig_groups[key] = sig_groups.get(key, 0) + 1
    for d in decisions:
        b = d.block
        if not b.is_figure or not d.accept:
            continue
        rid += 1
        rtype = "table" if b.tag in {"table", "td", "th", "tr", "caption"} else "figure"
        if sig_groups.get((b.parent_path, b.sibling_sig), 0) >= 2:
            rtype = "panel_row"
        caption = b.caption or (b.text if b.tag == "figcaption" else "")
        regions.append(Region(rid, rtype, b.start, b.end,
                              caption, FIGURE_CONF))
    return regions


def merge_spans(
    regions: list[Region], gap: int = MERGE_GAP
) -> tuple[list[Region], list[ConsolidationEvent]]:
    """M1+M2 over 1-D char spans: sort by (start, -len), single sweep;
    overlapping or gap≤N same-type spans merge; contained spans suppressed."""
    if not regions:
        return [], []
    events: list[ConsolidationEvent] = []
    ordered = sorted(regions, key=lambda r: (r.start, -(r.end - r.start), r.region_id))
    kept: list[Region] = [ordered[0]]
    for r in ordered[1:]:
        last = kept[-1]
        r_len = max(r.end - r.start, 1)
        last_len = max(last.end - last.start, 1)
        overlap = min(last.end, r.end) - max(last.start, r.start)
        contained = overlap >= CONTAIN_RATIO * r_len and last_len <= CONTAIN_PARENT_MAX * r_len
        if contained and r.region_type == last.region_type:
            events.append(ConsolidationEvent("suppress_contained",
                                             last.region_id, r.region_id))
            continue
        if r.region_type == last.region_type and r.start - last.end <= gap:
            last.end = max(last.end, r.end)
            if not last.caption:
                last.caption = r.caption
            events.append(ConsolidationEvent("merge", last.region_id,
                                             r.region_id))
            continue
        kept.append(r)
    # reading_order assignment (W5: enumerate after consolidation sort)
    for i, r in enumerate(kept, start=1):
        r.reading_order = i
    return kept, events
