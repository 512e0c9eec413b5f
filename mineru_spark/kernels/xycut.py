"""XY-Cut++ reading order (SURVEY.md §2.4 B8).

From-scratch recursive projection-cut ordering re-expressing the
reference's XY-Cut++ sorter (reference mineru/model/pptx/xycut_pp_sorter.py
:85-414, arXiv:2504.10258), used when a layout carries no model-emitted
reading-order index:

- PRE-MASK (:149-183): with ≥3 elements, an element whose width ≥
  beta × max-width and which horizontally overlaps ≥2 others (overlap ≥0.1
  of the smaller width) is a CROSS-LAYOUT element (a spanning banner over
  columns); it is removed before cutting and zipper-merged back by its top
  edge (:372-414).  The reference ships beta=2.0 (pptx_converter.py:42),
  which disables the mask — its designed value 0.7 sits commented out one
  line above (:41); we default to the designed 0.7 so the mask is live.
- axis choice (:233-267): largest projection gap wins (≥ MIN_GAP 5.0pt);
- NARROW-ELEMENT FILTER (:269-301): when no vertical cut exists, retry the
  vertical projection over elements at least 0.1× region width wide — a
  skinny margin note must not glue two columns together; the cut still
  splits ALL elements by center;
- recurse into each slice; leaves fall back to (y, x) ordering.

Input: list of [x0, y0, x1, y1] (top-left origin, y down).
Output: permutation of indices in reading order.
"""

from __future__ import annotations

MIN_GAP = 5.0
BETA = 0.7                  # cross-layout width threshold (designed value)
OVERLAP_THRESHOLD = 0.1     # horizontal overlap ratio to count a neighbor
MIN_OVERLAP_COUNT = 2       # neighbors overlapped to be cross-layout
NARROW_WIDTH_RATIO = 0.1    # vertical-cut retry ignores skinnier elements


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


def _x_gap_with_narrow_filter(items):
    """Vertical-cut search with the reference's narrow-element retry
    (:269-301): if the plain projection has no valid gap, ignore elements
    skinnier than 0.1× region width and look again."""
    gap = _largest_gap([(b[0], b[2]) for _, b in items])
    if gap is not None or len(items) < 3:
        return gap
    region_w = max(b[2] for _, b in items) - min(b[0] for _, b in items)
    thr = region_w * NARROW_WIDTH_RATIO
    wide = [(i, b) for i, b in items if b[2] - b[0] >= thr]
    if len(wide) < 2 or len(wide) == len(items):
        return None
    return _largest_gap([(b[0], b[2]) for _, b in wide])


def _order(items: list[tuple[int, list[float]]], depth: int = 0) -> list[int]:
    if len(items) <= 1 or depth > 12:
        return [i for i, _ in sorted(items, key=lambda t: (t[1][1], t[1][0]))]

    y_gap = _largest_gap([(b[1], b[3]) for _, b in items])
    x_gap = _x_gap_with_narrow_filter(items)
    # largest gap picks the axis: a column gutter wider than the inter-row
    # gap cuts vertically first → column-major reading order
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


def _h_overlap_ratio(a: list[float], b: list[float]) -> float:
    w = min(a[2], b[2]) - max(a[0], b[0])
    if w <= 0:
        return 0.0
    sw = min(a[2] - a[0], b[2] - b[0])
    return w / sw if sw > 0 else 0.0


def _cross_layout(items) -> list[tuple[int, list[float]]]:
    """Pre-mask (:149-183): wide elements horizontally overlapping ≥2
    others are cross-layout (spanning banners)."""
    if len(items) < 3:
        return []
    thr = BETA * max(b[2] - b[0] for _, b in items)
    out = []
    for i, b in items:
        if b[2] - b[0] < thr:
            continue
        n = sum(1 for j, c in items
                if j != i and _h_overlap_ratio(b, c) >= OVERLAP_THRESHOLD)
        if n >= MIN_OVERLAP_COUNT:
            out.append((i, b))
    return out


def xy_cut_order(bboxes: list[list[float]]) -> list[int]:
    """Reading-order permutation of block indices by recursive XY-Cut++
    (pre-mask → cut → zipper-merge, :85-111, :372-414)."""
    items = list(enumerate(bboxes))
    cross = _cross_layout(items)
    cross_ids = {i for i, _ in cross}
    main = [(i, b) for i, b in items if i not in cross_ids]
    if not main:
        return [i for i, _ in sorted(items, key=lambda t: (t[1][1], t[1][0]))]
    order_main = _order(main)
    if not cross:
        return order_main
    # zipper-merge (:372-414): cross elements, y-then-x sorted, re-enter
    # ahead of the first main element whose top edge is below theirs
    by_idx = dict(items)
    cross_sorted = [i for i, _ in
                    sorted(cross, key=lambda t: (t[1][1], t[1][0]))]
    result: list[int] = []
    mi = ci = 0
    while mi < len(order_main) or ci < len(cross_sorted):
        if ci >= len(cross_sorted):
            result.append(order_main[mi])
            mi += 1
        elif mi >= len(order_main):
            result.append(cross_sorted[ci])
            ci += 1
        elif by_idx[cross_sorted[ci]][1] <= by_idx[order_main[mi]][1]:
            result.append(cross_sorted[ci])
            ci += 1
        else:
            result.append(order_main[mi])
            mi += 1
    return result
