"""Continuous ingest: readStream over a pages landing zone -> fused
extraction -> idempotent parquet appends per micro-batch.

The streaming analog of the batch runner's anti-join resume: Structured
Streaming's source offsets + checkpointLocation replace the committed-
keys anti-join, giving the same at-least-once compute / exactly-once
commit contract, while each micro-batch reuses the identical extraction
plan (same kernel, same schema) as the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..pipeline import extract_fused
from ..sources.corpus import PAGES_SCHEMA


def stream_extract(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int = 10,
    max_files_per_trigger: int = 64,
    available_now: bool = False,
):
    """Drain parquet page files landing in `source_dir` into extracted
    (url, text, spans) parquet under `out_dir`.  Returns the query
    handle (call .awaitTermination() / .stop()).

    `available_now=True` processes everything currently available and
    stops — the batch-catch-up mode (and the test mode)."""
    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        extract_fused(spark, batch_df).write.mode("append").parquet(out_dir)

    writer = pages.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
