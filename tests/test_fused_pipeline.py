"""Fused (zero-shuffle) pipeline must equal the relational pipeline and
the constructive goldens."""

import pyspark.sql.functions as F

from origami_spark.pipeline import extract, extract_fused
from origami_spark.sources.corpus import pages_df


def test_fused_matches_goldens_and_relational(spark):
    pages = pages_df(spark, 250, num_partitions=8).cache()
    fused = extract_fused(spark, pages)
    cmp = fused.join(pages.select("url", F.col("text").alias("golden")), "url")
    assert cmp.count() == 250
    assert cmp.filter("text != golden").count() == 0

    rel = extract(spark, pages).select("url", "text", "spans")
    fu = fused.select("url", "text", "spans")
    assert rel.exceptAll(fu).count() == 0
    assert fu.exceptAll(rel).count() == 0
