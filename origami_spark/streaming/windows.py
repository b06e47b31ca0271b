"""Streaming windowed aggregation with watermark (capability module).

HONESTY NOTE: the reference has no streaming semantics (SURVEY.md
§2.10); this module exists because a crawl-ingest deployment of the
extractor wants progress metrics over event time — documents/minute per
host with bounded state.  The aggregation is the standard Structured
Streaming shape: event-time tumbling window + watermark so late
arrivals beyond the bound are dropped and state is evicted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pages_per_host_window(
    pages_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming DF (url, warc_ts, ...) -> windowed per-host counts.

    Works identically on a batch DataFrame (Spark's unified semantics),
    which is exactly how the test pins correctness: run the same
    expression in batch, compare."""
    host = F.regexp_extract("url", "https?://([^/]+)/", 1).alias("host")
    src = pages_stream.withColumn("host", host)
    if src.isStreaming:
        src = src.withWatermark("warc_ts", watermark)
    return (
        src.groupBy(F.window("warc_ts", window).alias("w"), "host")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            "host",
            "n_pages",
        )
    )
