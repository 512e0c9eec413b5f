"""XY-cut reading order (SURVEY.md §2.4 B8).

From-scratch recursive projection-cut ordering in the spirit of the
reference's XY-Cut++ sorter (reference mineru/model/pptx/xycut_pp_sorter.py:
85-414, arXiv:2504.10258), used when a layout carries no model-emitted
reading-order index:

- choose the cut axis whose projection has the largest gap
  (≥ MIN_GAP pt, reference const :28-33 uses 5.0);
- recurse into each slice; leaves fall back to (y, x) ordering;
- y-cuts are preferred before x-cuts at equal gap (top-to-bottom
  dominates column splitting), matching the reference's
  density-ratio-guarded axis choice simplified to our synthetic layouts.

Input: list of [x0, y0, x1, y1] (top-left origin, y down).
Output: permutation of indices in reading order.
"""

from __future__ import annotations

MIN_GAP = 5.0


def _largest_gap(intervals: list[tuple[float, float]]) -> tuple[float, float] | None:
    """Largest empty gap in the 1-D projection of [lo, hi) intervals;
    returns (gap_lo, gap_hi) or None if no gap ≥ MIN_GAP."""
    ivs = sorted(intervals)
    best = None
    cur_hi = ivs[0][1]
    for lo, hi in ivs[1:]:
        if lo - cur_hi >= MIN_GAP:
            g = (cur_hi, lo)
            if best is None or (g[1] - g[0]) > (best[1] - best[0]):
                best = g
        cur_hi = max(cur_hi, hi)
    return best


def _split(items, axis_lo, axis_hi, gap):
    mid = (gap[0] + gap[1]) / 2.0
    a = [it for it in items if (it[1][axis_lo] + it[1][axis_hi]) / 2.0 < mid]
    b = [it for it in items if (it[1][axis_lo] + it[1][axis_hi]) / 2.0 >= mid]
    return a, b


def _order(items: list[tuple[int, list[float]]], depth: int = 0) -> list[int]:
    if len(items) <= 1 or depth > 12:
        return [i for i, _ in sorted(items, key=lambda t: (t[1][1], t[1][0]))]

    y_gap = _largest_gap([(b[1], b[3]) for _, b in items])
    x_gap = _largest_gap([(b[0], b[2]) for _, b in items])
    # largest gap picks the axis (the reference's density-ratio axis choice
    # simplified); a column gutter wider than the inter-row gap cuts
    # vertically first → column-major reading order
    y_w = (y_gap[1] - y_gap[0]) if y_gap else -1.0
    x_w = (x_gap[1] - x_gap[0]) if x_gap else -1.0
    if y_gap is not None and y_w >= x_w:
        top, bot = _split(items, 1, 3, y_gap)
        if top and bot:
            return _order(top, depth + 1) + _order(bot, depth + 1)
    if x_gap is not None:
        left, right = _split(items, 0, 2, x_gap)
        if left and right:
            return _order(left, depth + 1) + _order(right, depth + 1)
    if y_gap is not None:
        top, bot = _split(items, 1, 3, y_gap)
        if top and bot:
            return _order(top, depth + 1) + _order(bot, depth + 1)

    return [i for i, _ in sorted(items, key=lambda t: (t[1][1], t[1][0]))]


def xy_cut_order(bboxes: list[list[float]]) -> list[int]:
    """Reading-order permutation of block indices by recursive XY-cut."""
    return _order(list(enumerate(bboxes)))
