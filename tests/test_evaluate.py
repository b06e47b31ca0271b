"""Evaluation + track-changes + orders-table artifacts."""

import pyspark.sql.functions as F

from origami_spark.operators.layout import refine
from origami_spark.operators.order import orders_table, rank_blocks
from origami_spark.pipeline import extract_fused, parse_stage
from origami_spark.plans.evaluate import evaluate, evaluate_cer, track_changes
from origami_spark.sources.corpus import pages_df


def test_evaluate_all_pass_on_goldens(spark):
    pages = pages_df(spark, 100, num_partitions=4).cache()
    out = extract_fused(spark, pages)
    row = evaluate(out, pages.select("url", "text")).collect()[0]
    assert row["docs"] == 100
    assert row["byte_identical"] == 100
    assert row["pass_rate"] == 1.0
    assert row["missing_docs"] == 0 and row["extra_docs"] == 0


def test_evaluate_detects_regressions(spark):
    pages = pages_df(spark, 50, num_partitions=4).cache()
    out = extract_fused(spark, pages)
    corrupted = out.withColumn(
        "text",
        F.when(F.col("url").endswith("a1"), F.concat("text", F.lit("X")))
        .otherwise(F.col("text")),
    )
    row = evaluate(corrupted, pages.select("url", "text")).collect()[0]
    assert row["byte_identical"] == 49
    assert row["max_abs_len_delta"] == 1


def test_evaluate_cer(spark):
    pages = pages_df(spark, 40, num_partitions=4).cache()
    out = extract_fused(spark, pages).cache()
    # perfect extraction -> CER 0
    row = evaluate_cer(out, pages.select("url", "text")).collect()[0]
    assert row["cer"] == 0.0 and row["total_edits"] == 0
    # one doc with 3 substituted chars at the start -> exactly 3 edits
    target = out.filter("length(text) > 10").first()["url"]
    corrupted = out.withColumn(
        "text",
        F.when(F.col("url") == target,
               F.concat(F.lit("XYZ"), F.expr("substring(text, 4)")))
        .otherwise(F.col("text")),
    )
    row = evaluate_cer(corrupted, pages.select("url", "text")).collect()[0]
    assert row["total_edits"] == 3
    assert 0 < row["cer"] < 0.01


def test_track_changes(spark):
    pages = pages_df(spark, 40, num_partitions=4).cache()
    out = extract_fused(spark, pages).cache()
    half = out.limit(20)
    mutated = out.withColumn(
        "text",
        F.when(F.col("url").endswith("a2"), F.lit("DIFFERENT"))
        .otherwise(F.col("text")),
    )
    tc = track_changes(mutated, out)
    counts = {r["status"]: r["n"] for r in
              tc.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts.get("changed", 0) == 1
    assert counts.get("checked", 0) == 39
    tc2 = track_changes(half, out)
    counts2 = {r["status"]: r["n"] for r in
               tc2.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts2.get("gone", 0) == 20


def test_orders_table_contract(spark):
    pages = pages_df(spark, 60, num_partitions=4)
    ranked = rank_blocks(refine(parse_stage(pages)))
    orders = orders_table(ranked)
    rows = orders.collect()
    assert rows
    for r in rows:
        om = r["orders"]
        assert "*" in om
        star = om["*"]
        # '*' is the concatenation-order of all per-label paths
        per_label = [p for lbl, paths in om.items() if lbl != "*" for p in paths]
        assert sorted(star) == sorted(per_label)
        assert len(set(star)) == len(star)  # a permutation, no dupes
