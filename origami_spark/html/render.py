"""Deterministic plain-text table rendering (psql-style ASCII).

Reimplements the subset of ``tabulate(tablefmt="psql")`` the reference's
compose stage relies on (``batch/detect/compose.py:305-338``:
``TableRegion.to_text`` renders multi-column tables psql-style with
``headers="firstrow"`` iff the first division is a single row).

Spec (unit-tested against hand-written goldens in tests/test_render.py):

* column width = max display length over all cells in that column
* cell rendered as ``'| ' + cell.ljust(width) + ' '``; rows end with ``'|'``
* top/bottom/inner borders: ``'+' + '-'*(width+2)`` per column + ``'+'``
* with a header row, the separator below it uses ``'|'`` at both ends and
  ``'+'`` at column joints (tabulate's psql header rule)
* short rows are padded with empty cells; a single-column table renders as
  plain joined lines (reference: one column -> plain text,
  ``compose.py:312-317``)
"""

from __future__ import annotations


def render_table(rows: list, has_header: bool) -> str:
    """rows: list of list[str] (already normalized cell text)."""
    if not rows:
        return ""
    ncols = max(len(r) for r in rows)
    if ncols == 1:
        return "\n".join(r[0] for r in rows if r and r[0])
    grid = [list(r) + [""] * (ncols - len(r)) for r in rows]
    widths = [max(len(r[c]) for r in grid) for c in range(ncols)]

    def border(left: str, mid: str, right: str) -> str:
        return left + mid.join("-" * (w + 2) for w in widths) + right

    def line(r: list) -> str:
        return "| " + " | ".join(r[c].ljust(widths[c]) for c in range(ncols)) + " |"

    out = [border("+", "+", "+")]
    body = grid
    if has_header and len(grid) > 1:
        out.append(line(grid[0]))
        out.append(border("|", "+", "|"))
        body = grid[1:]
    for r in body:
        out.append(line(r))
    out.append(border("+", "+", "+"))
    return "\n".join(out)
