"""Streaming ingest smoke: drain a landing zone incrementally, verify
exactly-once per-url output equal to the batch path."""

import pyspark.sql.functions as F

from origami_spark.sources.corpus import pages_df
from origami_spark.streaming import stream_extract


def test_stream_extract_drains_landing_zone(spark, tmp_path):
    land = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pages = pages_df(spark, 80, num_partitions=4).cache()
    pages.filter("url like '%a_' or url like '%a__'").write.mode(
        "append").parquet(land)  # first drop: docs 0-99 subset

    q = stream_extract(spark, land, out, ckpt, available_now=True)
    q.awaitTermination(120)
    first = spark.read.parquet(out)
    n1 = first.count()
    assert n1 == first.select("url").distinct().count()

    # second drop lands later; restart drains ONLY the new files
    pages.write.mode("append").parquet(land)
    q = stream_extract(spark, land, out, ckpt, available_now=True)
    q.awaitTermination(120)
    final = spark.read.parquet(out)
    # every url extracted, byte-identical to golden
    cmp = final.join(pages.select("url", F.col("text").alias("golden")), "url")
    assert cmp.filter("text != golden").count() == 0
    assert final.select("url").distinct().count() == 80
