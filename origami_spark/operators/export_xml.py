"""XML export of composed documents (PAGE-XML analog, closes the one
deferred §2.9 row).

Reference: ``export_page_xml`` emits a PAGE-XML document with region
reading-order references (``batch/detect/compose.py:640-669``).  The
web re-expression keeps the structure — document element, ordered
block elements with ids and raw-byte coordinates (the PAGE-XML Coords
analog), text content — but uses a plain XML dialect since PAGE-XML's
schema is image-specific (points, baselines).

Entirely Catalyst expressions: escaping via regexp_replace chain,
assembly via transform + array_join — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _esc(col) -> Column:
    c = F.regexp_replace(col, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    c = F.regexp_replace(c, ">", "&gt;")
    # attribute contexts are double-quoted; urls are user-controlled
    c = F.regexp_replace(c, '"', "&quot;")
    return c


def to_xml(composed: DataFrame) -> DataFrame:
    """compose output (url, text, spans) -> (url, xml).

    Block text is re-sliced from `spans` positions?  No — compose has
    already joined block texts with '\\n\\n'; the XML carries the block
    *structure* (path, label, raw-byte span) plus the full composed
    text, which is exactly the information the reference's XML adds
    over page.txt (reading order + region geometry)."""
    blocks_xml = F.array_join(
        F.transform(
            "spans",
            lambda s: F.concat(
                F.lit('  <Block id="'), _esc(s["path"]),
                F.lit('" label="'), _esc(s["label"]),
                F.lit('" start="'), s["start"].cast("string"),
                F.lit('" end="'), s["end"].cast("string"),
                F.lit('"/>'),
            ),
        ),
        "\n",
    )
    order_xml = F.array_join(
        F.transform("spans", lambda s: F.concat(
            F.lit('    <Ref idref="'), _esc(s["path"]), F.lit('"/>'))),
        "\n",
    )
    xml = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?>\n<Document url="'),
        _esc(F.col("url")),
        F.lit('">\n  <ReadingOrder>\n'),
        order_xml,
        F.lit("\n  </ReadingOrder>\n"),
        blocks_xml,
        F.lit("\n  <Text>"),
        _esc(F.col("text")),
        F.lit("</Text>\n</Document>\n"),
    )
    return composed.select("url", xml.alias("xml"))
