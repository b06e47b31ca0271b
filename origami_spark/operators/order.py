"""Reading order stage (S7) — deterministic block ordering.

Origami orders 2-D regions with a recursive XY-cut (``core/xycut.py:
187-241``) plus separator-aware gap scoring (``ObstacleSampler``,
``core/separate.py:96-162``).  Character spans are 1-D, where the XY-cut
recursion collapses to exactly "sort by span start": every gap between
non-overlapping spans is a valid cut, recursion depth n, leaves in start
order.  So the *operator* here is a window ``row_number`` — the honest
1-D XY-cut — and ``xy_cut_1d`` below keeps the recursive form (with gap
scoring and overlap-tolerant splitting) for parity, property tests, and
any future 2-D layout source (PDF).

Output mirrors ``order.json``'s ``{"*": [paths...]}`` contract
(``docs/formats.md:337-379``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_blocks(refined: DataFrame) -> DataFrame:
    """Add `rank` = reading-order position per url (1-based)."""
    w = Window.partitionBy("url").orderBy("start", "seq")
    return refined.withColumn("rank", F.row_number().over(w))


def orders_table(ranked: DataFrame) -> DataFrame:
    """S7 table: (url, orders map<label-family, array<path>>), '*' = global.

    Reference: ``xycut_orders`` emits one order per label family plus the
    global '*' order, ILLUSTRATION excluded (``batch/detect/order.py:
    74-94``)."""
    per_label = (
        ranked.groupBy("url", "label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "path"))),
                lambda s: s["path"],
            ).alias("paths")
        )
    )
    star = (
        ranked.groupBy("url")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "path"))),
                lambda s: s["path"],
            ).alias("paths")
        )
        .withColumn("label", F.lit("*"))
    )
    both = per_label.unionByName(star.select("url", "label", "paths"))
    return both.groupBy("url").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("label", "paths")))
        ).alias("orders")
    )


# ---------------------------------------------------------------------------
# Recursive 1-D XY-cut (parity implementation; used by property tests and
# as the tie-break kernel for overlapping spans from non-HTML sources)
# ---------------------------------------------------------------------------

def _norm_separators(separators):
    """(start, end) or (start, end, strength) -> sorted 3-tuples; a bare
    pair gets the default strength 1.0 (which reproduces the historical
    constant x2 boost)."""
    return sorted(
        (s[0], s[1], s[2] if len(s) > 2 else 1.0) for s in (separators or [])
    )


def separator_gap_score(lo: int, hi: int, seps) -> float:
    """Gap score = width x (1 + strength of the strongest separator
    fully inside the gap) — the ObstacleSampler flow boost weighted by
    separator strength (reference core/separate.py:96-162 +
    batch/detect/order.py:96-106 thick-separator weighting)."""
    width = hi - lo
    strongest = max(
        (st for (s, e, st) in seps if lo <= s and e <= hi), default=0.0
    )
    return width * (1.0 + strongest)

def xy_cut_1d(spans, separators=None):
    """spans: list of (id, start, end). Returns ids in reading order.

    Recursive gap cut: find candidate cut positions (gaps no span
    crosses), pick the best-scored one, recurse.  Overlapping spans that
    admit no cut are emitted in (start, id) order — the reference's
    grouped-leaf fallback (``core/xycut.py:244-276``).

    `separators`: optional list of (start, end) or (start, end,
    strength) separator spans.  A gap containing a separator scores
    x(1 + strength) — the ObstacleSampler "flow" boost weighted by the
    separator's estimated visual strength (``core/separate.py:96-162``
    multiplies the gap score by (1 + flow) for separators parallel to
    the cut, and ``batch/detect/order.py:96-106`` weights thick
    separators harder; strength=1.0, the default separator, reproduces
    the former constant x2 boost).  In 1-D a cut can never pierce a
    span, so the perpendicular "obstacle" penalty is structurally
    impossible and only the boost survives."""
    seps = _norm_separators(separators)

    def gap_score(lo: int, hi: int) -> float:
        return separator_gap_score(lo, hi, seps)

    def rec(items):
        if len(items) <= 1:
            return [s[0] for s in items]
        best_score, best_at = -1.0, None
        max_end = items[0][2]
        for i in range(1, len(items)):
            gap = items[i][1] - max_end
            if gap >= 0:
                sc = gap_score(max_end, items[i][1])
                if sc > best_score:
                    best_score, best_at = sc, i
            max_end = max(max_end, items[i][2])
        if best_at is None:
            return [s[0] for s in items]  # unresolvable overlap group
        return rec(items[:best_at]) + rec(items[best_at:])

    return rec(sorted(spans, key=lambda s: (s[1], s[2], s[0])))
