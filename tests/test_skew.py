"""Skew handling: Zipf-skewed hosts must not gang up in partitions
(SURVEY.md §4 — the custom skew requirement of the north rule)."""

import pyspark.sql.functions as F

from origami_spark.sources.corpus import pages_df


def test_corpus_hosts_are_zipf_skewed(spark):
    pages = pages_df(spark, 2000, num_partitions=8).cache()
    hosts = (
        pages.select(F.regexp_extract("url", "https://([^/]+)/", 1).alias("h"))
        .groupBy("h").count().orderBy(F.desc("count")).collect()
    )
    # the generator must actually produce a skewed host distribution,
    # or this test proves nothing
    assert hosts[0]["count"] > 4 * hosts[-1]["count"]


def test_url_hash_partitioning_neutralizes_host_skew(spark):
    pages = pages_df(spark, 2000, num_partitions=8)
    parts = (
        pages.repartition(16, "url")
        .select(F.spark_partition_id().alias("pid"))
        .groupBy("pid").count().collect()
    )
    counts = [r["count"] for r in parts]
    assert len(counts) == 16
    mean = sum(counts) / len(counts)
    # urls are unique, so hash partitioning balances regardless of the
    # host skew above: no partition more than 35% off the mean
    assert max(counts) < 1.35 * mean, counts
    assert min(counts) > 0.65 * mean, counts
