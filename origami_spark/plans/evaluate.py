"""Evaluation + regression tracking.

* ``evaluate`` — extraction quality vs ground truth (the dinglehopper
  evaluation analog, ``batch/utils/evaluate.py:107-136``, at corpus
  scale): per-url byte-identity + length deltas, aggregated to corpus
  rates.  Byte-identity is the reference's own acceptance notion
  (``--track-changes`` byte diff, ``io.py:419-475``).

* ``track_changes`` — recompute-and-diff between two snapshots of the
  same stage table (TrackChangeWriter analog): join on url, compare
  sha2 digests, report changed/checked counts per url.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def evaluate(extracted: DataFrame, truth: DataFrame) -> DataFrame:
    """extracted (url, text) x truth (url, text) -> one summary row:
    doc counts, byte-identical rate, mean/max length delta of misses."""
    joined = (
        extracted.select("url", F.col("text").alias("got"))
        .join(truth.select("url", F.col("text").alias("want")), "url", "full")
    )
    per_url = joined.select(
        "url",
        (F.col("got") == F.col("want")).alias("exact"),
        (F.coalesce(F.length("got"), F.lit(0))
         - F.coalesce(F.length("want"), F.lit(0))).alias("len_delta"),
        F.col("got").isNull().alias("missing"),
        F.col("want").isNull().alias("extra"),
    )
    return per_url.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.when(F.col("exact"), 1).otherwise(0)).alias("byte_identical"),
        F.round(
            F.avg(F.when(F.col("exact"), 1.0).otherwise(0.0)), 6
        ).alias("pass_rate"),
        F.sum(F.when(F.col("missing"), 1).otherwise(0)).alias("missing_docs"),
        F.sum(F.when(F.col("extra"), 1).otherwise(0)).alias("extra_docs"),
        F.round(F.avg(F.abs("len_delta")), 3).alias("mean_abs_len_delta"),
        F.max(F.abs("len_delta")).alias("max_abs_len_delta"),
    )


def track_changes(new: DataFrame, old: DataFrame, key: str = "url",
                  payload: str = "text") -> DataFrame:
    """Recompute-diff two snapshots: per-key status changed/checked/new/
    gone (TrackChangeWriter's .changed/.checked markers, io.py:419-475)."""
    n = new.select(F.col(key).alias("k"), F.sha2(F.col(payload), 256).alias("nh"))
    o = old.select(F.col(key).alias("k"), F.sha2(F.col(payload), 256).alias("oh"))
    j = n.join(o, "k", "full")
    return j.select(
        F.col("k").alias(key),
        F.when(F.col("nh").isNull(), "gone")
        .when(F.col("oh").isNull(), "new")
        .when(F.col("nh") == F.col("oh"), "checked")
        .otherwise("changed")
        .alias("status"),
    )
