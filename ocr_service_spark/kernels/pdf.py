"""PDF layout reconstruction: XY-cut reading-order sort.

North-rule operator with no reference counterpart (SURVEY.md §2.5).
Public-algorithm basis: Nagy & Seth's recursive X-Y cut page segmentation
(ICPR 1984) — recursively split the set of text boxes at the widest
horizontal, then vertical, whitespace gap; emit leaves top-to-bottom,
left-to-right. This reconstructs multi-column reading order.

Span payload format for kind='pdf': one line fragment per row,
``x|y|w|h|text`` separated by newlines (coordinates in points).
"""

from __future__ import annotations

from dataclasses import dataclass

# Minimum whitespace gap (in coordinate units) to cut at.
MIN_GAP_X = 18.0  # between columns
MIN_GAP_Y = 14.0  # between paragraphs/sections


@dataclass(frozen=True)
class Box:
    x: float
    y: float
    w: float
    h: float
    text: str
    seq: int  # input position, final tie-break for determinism


def parse_fragments(payload: str | None) -> list[Box]:
    boxes: list[Box] = []
    if not payload:
        return boxes
    for i, line in enumerate(payload.split("\n")):
        parts = line.split("|", 4)
        if len(parts) != 5:
            continue
        try:
            x, y, w, h = (float(p) for p in parts[:4])
        except ValueError:
            continue
        boxes.append(Box(x, y, w, h, parts[4], i))
    return boxes


def _largest_gap(intervals: list[tuple[float, float]], min_gap: float):
    """Largest gap between merged occupied intervals; None if < min_gap."""
    if len(intervals) < 2:
        return None
    intervals = sorted(intervals)
    merged = [list(intervals[0])]
    for lo, hi in intervals[1:]:
        if lo <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    best, best_gap = None, min_gap
    for (_, hi), (lo, _) in zip(merged, merged[1:]):
        gap = lo - hi
        if gap >= best_gap:
            best_gap, best = gap, (hi + lo) / 2.0
    return best


def _xycut(boxes: list[Box], depth: int = 0) -> list[Box]:
    if len(boxes) <= 1 or depth > 32:
        return boxes
    # horizontal cut first (split stacked sections by y)...
    cut_y = _largest_gap([(b.y, b.y + b.h) for b in boxes], MIN_GAP_Y)
    if cut_y is not None:
        top = [b for b in boxes if b.y + b.h / 2.0 < cut_y]
        bottom = [b for b in boxes if b.y + b.h / 2.0 >= cut_y]
        if top and bottom:
            return _xycut(top, depth + 1) + _xycut(bottom, depth + 1)
    # ...then vertical (split columns by x)
    cut_x = _largest_gap([(b.x, b.x + b.w) for b in boxes], MIN_GAP_X)
    if cut_x is not None:
        left = [b for b in boxes if b.x + b.w / 2.0 < cut_x]
        right = [b for b in boxes if b.x + b.w / 2.0 >= cut_x]
        if left and right:
            return _xycut(left, depth + 1) + _xycut(right, depth + 1)
    # leaf: plain top-to-bottom, left-to-right, input order as tie-break
    return sorted(boxes, key=lambda b: (b.y, b.x, b.seq))


def reconstruct_reading_order(payload: str | None) -> str:
    """Reorder pdf line fragments into reading order; join with newlines."""
    boxes = parse_fragments(payload)
    if not boxes:
        return ""
    return "\n".join(b.text for b in _xycut(boxes))
