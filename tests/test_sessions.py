"""Custom stateful streaming operator (applyInPandasWithState)."""

import pyspark.sql.functions as F

from origami_spark.streaming.sessions import sessionize

GAP = 1800


def _batch_truth(spark, events):
    """All-but-last session per user via the q06-style window logic."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    grp = F.sum(
        F.when(gap.isNull() | (gap > GAP), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sess = (
        events.withColumn("grp", grp)
        .groupBy("user_id", "grp")
        .agg(
            F.min(F.unix_timestamp("ts")).alias("session_start"),
            F.max(F.unix_timestamp("ts")).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    last = sess.groupBy("user_id").agg(F.max("grp").alias("last_grp"))
    return (
        sess.join(last, "user_id")
        .filter(F.col("grp") != F.col("last_grp"))  # open sessions stay in state
        .select("user_id", "session_start", "session_end", "n_events")
    )


def test_stateful_sessionize_across_microbatches(spark, tmp_path):
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id", "user_id", "ts")
        .cache()
    )
    land = str(tmp_path / "land")
    # time-ordered drops so state genuinely spans micro-batches
    events.orderBy("ts").coalesce(8).write.parquet(land)

    stream = (
        spark.readStream.schema("event_id bigint, user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    q = (
        sessionize(stream, GAP)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", str(tmp_path / "out"))
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in _batch_truth(spark, events).collect()
    }
    assert got == want
    assert len(got) > 10  # the corpus must actually exercise sessions
