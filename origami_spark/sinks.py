"""Training-data export sinks.

``export_jsonl`` writes any DataFrame as size-targeted, compressed
JSONL shards — the interchange format LLM data pipelines ingest.  Shard
count is derived from the data's own serialized size (one cheap
aggregate), so a 100 TB export lands as ~target-sized files instead of
one file per upstream partition (tiny-file explosion) or a handful of
unsplittable monsters.  Gzip keeps shards independently readable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_jsonl(df: DataFrame, path: str, target_shard_mb: int = 256,
                 compression: str = "gzip") -> int:
    """Write `df` as JSONL shards of ~`target_shard_mb` (uncompressed
    estimate).  Returns the shard count.

    The input is persisted for the duration so the sizing aggregate and
    the write share one computation of the lineage (an unpersisted
    frame would be computed twice — double cost at a 100 TB export);
    sizes use octet_length (bytes), not character counts."""
    already_cached = df.is_cached
    if not already_cached:
        df = df.persist()
    try:
        size_row = df.select(
            F.sum(F.octet_length(F.to_json(F.struct(*df.columns)))).alias("b")
        ).collect()[0]
        total = (size_row["b"] or 0) + 1
        shards = max(1, math.ceil(total / (target_shard_mb * 1024 * 1024)))
        (
            df.repartition(shards)
            .write.mode("overwrite")
            .option("compression", compression)
            .json(path)
        )
    finally:
        if not already_cached:
            df.unpersist()
    return shards
