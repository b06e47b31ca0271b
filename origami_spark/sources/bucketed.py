"""Bucketed (co-located) tables — shuffle-free joins for hot key pairs.

At 100 TB the biggest recurring cost is re-shuffling two large tables
onto a shared join key (orders x lineitem, blocks x lines, ...).
Bucketing pays that shuffle ONCE at write time: both tables are written
`bucketBy(n, key).sortBy(key)`, after which every join on that key is
planned as a sort-merge join over already-co-located, already-sorted
buckets — zero Exchange, zero Sort (asserted in
tests/test_bucketing.py).

This is the Spark-native analog of the reference keeping its per-page
artifact files side by side on disk (``batch/core/processor.py``
artifact directories): related rows land in the same place so later
stages never pay redistribution.  On a cluster the same code works
against any catalog; locally the tables are external (explicit `path`)
so tests stay hermetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, path: str, key: str,
                   buckets: int = 16) -> None:
    """Write `df` as an external bucketed+sorted parquet table."""
    (
        df.write.bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .mode("overwrite")
        .saveAsTable(table)
    )


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   key_left: str, key_right: str) -> DataFrame:
    """Join two bucketed tables on their bucket keys.

    When both tables were written with the same bucket count, Catalyst
    reads the bucket layout from the catalog and plans the join without
    any Exchange."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[key_left] == right[key_right])
