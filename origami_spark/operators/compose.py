"""Compose stage (S8) — final text assembly, entirely in Catalyst.

PlainTextComposition analog (reference ``batch/detect/compose.py:
565-585``): blocks in reading order, '\\n\\n' between blocks, trailing
'\\n' when non-empty; pages with no surviving blocks produce "".

Everything here is built-in expressions (groupBy + array_sort +
transform + array_join + concat), so the whole stage is JVM-side
whole-stage-codegen — zero Python in the assembly path.  The spans
output indexes into the *raw* html bytes (rewarp analog,
``compose.py:413-432``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COMPOSE_SCHEMA_HINT = (
    "url string, text string, "
    "spans array<struct<path:string,label:string,start:bigint,end:bigint>>"
)


def compose(ranked: DataFrame, pages: DataFrame) -> DataFrame:
    """ranked blocks (rank,text,path,label,start,end) + pages -> S8 table.

    `pages` supplies the full url universe so documents with zero
    surviving blocks still emit a row with text='' (a page with no
    reliable regions still gets a compose artifact in the reference)."""
    per_url = ranked.groupBy("url").agg(
        F.array_sort(
            F.collect_list(F.struct("rank", "path", "label", "start", "end", "text"))
        ).alias("bs")
    )
    assembled = per_url.select(
        "url",
        F.concat(
            F.array_join(F.transform("bs", lambda b: b["text"]), "\n\n"),
            F.lit("\n"),
        ).alias("text"),
        F.transform(
            "bs",
            lambda b: F.struct(
                b["path"].alias("path"),
                b["label"].alias("label"),
                b["start"].alias("start"),
                b["end"].alias("end"),
            ),
        ).alias("spans"),
    )
    return (
        pages.select("url")
        .join(assembled, "url", "left")
        .select(
            "url",
            F.coalesce("text", F.lit("")).alias("text"),
            F.coalesce(
                "spans",
                F.expr(
                    "cast(array() as array<struct<path:string,label:string,"
                    "start:bigint,end:bigint>>)"
                ),
            ).alias("spans"),
        )
    )
