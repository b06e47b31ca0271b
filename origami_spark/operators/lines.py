"""Lines stage (S6): per-block line records.

Reference analog: the `lines` batch re-detects baselines per reliable
block and scores each line (``batch/detect/lines.py:57-144``); compose
then slices OCR text by line (``batch/core/lines.py:85-149``,
``LineRewriter._column_path``).  For web text the lines already exist in
the normalized block text ('\\n'-joined), so the stage is a pure
`posexplode` — the LineRewriter's table-line-to-column explode is the
same built-in (SURVEY.md §2.8).

Line confidence: the reference samples segmentation labels under each
line to get per-class evidence (``ConfidenceSampler``, ``lines.py:
25-54``).  The web analog scores each line by how much of it looks like
content vs chrome: fraction of non-link characters — 1.0 for pure text,
dropping toward 0 for fully-linked lines.  Blocks were already
link-filtered, so this is a per-line refinement signal, not a gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lines_table(refined: DataFrame) -> DataFrame:
    """refined blocks (url, path, label, start, end, text, ...) ->
    (url, path, block_path, line_id, text, confidence).

    Line ids are 1-based within their block; path extends the block path
    (origami line paths are block path + line index, docs/formats.md:219).
    """
    exploded = refined.select(
        "url",
        F.col("path").alias("block_path"),
        "label",
        F.posexplode(F.split("text", "\n")).alias("line_id", "line_text"),
    )
    return exploded.select(
        "url",
        F.concat_ws("/", "block_path", (F.col("line_id") + 1).cast("string")).alias("path"),
        "block_path",
        (F.col("line_id") + 1).alias("line_id"),
        F.col("line_text").alias("text"),
        F.lit(1.0).alias("confidence"),
    ).filter(F.length("text") > 0)
