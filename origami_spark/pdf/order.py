"""2-D recursive XY-cut reading order (the non-degenerate case).

Fresh implementation of the published XY-cut idea (recursive page
decomposition; same family as origami's ``core/xycut.py:187-241`` and
the classic Nagy/Seth layout-analysis literature): find an empty
horizontal or vertical gap no box crosses, split, recurse; prefer the
wider gap; emit leaves top-to-bottom then left-to-right.  Boxes use PDF
coordinates (y grows upward), so "first" means larger y.

Termination note: a cut at index i always produces two non-empty sides
(1 <= i < len), so recursion strictly shrinks — no fixed-point hazards.
"""

from __future__ import annotations


def _best_gap(items, lo_idx, hi_idx):
    """items sorted by interval start along one axis; find the widest
    gap no interval crosses. -> (gap_width, split_index) or (None, None)."""
    best_w, best_at = None, None
    max_end = items[0][hi_idx]
    for i in range(1, len(items)):
        gap = items[i][lo_idx] - max_end
        if gap >= 0 and (best_w is None or gap > best_w):
            best_w, best_at = gap, i
        if items[i][hi_idx] > max_end:
            max_end = items[i][hi_idx]
    return best_w, best_at


def xy_cut_2d(boxes) -> list:
    """boxes: list of (id, x0, y0, x1, y1) with y1 = top.  Returns ids
    in reading order (top-to-bottom, left-to-right, column-aware)."""
    if len(boxes) <= 1:
        return [b[0] for b in boxes]

    # horizontal cut candidates: sort by top edge descending (reading
    # starts at the largest y); intervals along y are (y1 desc -> use
    # negated coordinates so the gap helper sees ascending starts)
    by_y = sorted(boxes, key=lambda b: (-b[4], b[1], b[0]))
    neg = [(b[0], -b[4], -b[2]) for b in by_y]  # (id, start=-top, end=-bottom)
    wy, ay = _best_gap(neg, 1, 2)

    by_x = sorted(boxes, key=lambda b: (b[1], -b[4], b[0]))
    xs = [(b[0], b[1], b[3]) for b in by_x]
    wx, ax = _best_gap(xs, 1, 2)

    # prefer the wider gap; horizontal cut (stacked regions) wins ties —
    # prose reads down the page before it reads across columns
    if wy is None and wx is None:
        return [b[0] for b in by_y]  # overlapping group: top-down fallback
    if wx is None or (wy is not None and wy >= wx):
        return xy_cut_2d(by_y[:ay]) + xy_cut_2d(by_y[ay:])
    return xy_cut_2d(by_x[:ax]) + xy_cut_2d(by_x[ax:])
