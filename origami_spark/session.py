"""SparkSession factory with scale-oriented defaults.

Tuned for the pipeline's shape: wide binary payloads through Arrow
kernels + relational glue.  On a real cluster the same settings apply;
only ``master`` changes (spark-submit provides it).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32
# html payloads can be MBs; bound Arrow batch size so one batch of large
# pages never blows executor memory (the reference bounds worker RSS via
# maxtasksperchild=4, processor.py:483 — same concern, Spark-native knob)
ARROW_MAX_RECORDS = 512


def get_spark(app: str = "origami_spark", cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sp = shuffle_partitions or int(
        os.environ.get("ORIGAMI_SHUFFLE_PARTITIONS", str(max(cores, DEFAULT_SHUFFLE_PARTITIONS)))
    )
    builder = (
        SparkSession.builder.appName(app)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # extracted text compresses ~5-10x in shuffle files; the 64m
        # default advisory size makes AQE coalesce post-shuffle stages of
        # small corpora down to 1-4 tasks and serializes the relational
        # chain.  8m keeps local runs parallel; on a 100 TB cluster the
        # shuffles are far above either threshold so this is a no-op.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("ORIGAMI_ADVISORY_PARTITION", "8m"),
        )
        # allow shuffled-hash join where the per-partition build side
        # fits (guide §9/§3.1): SMJ pays a full sort of both sides that
        # a hash build avoids; AQE still rewrites to broadcast when a
        # side is small, and SMJ remains the planner's fallback when
        # the size conditions fail
        .config("spark.sql.join.preferSortMergeJoin",
                os.environ.get("ORIGAMI_PREFER_SMJ", "false"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_MAX_RECORDS))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("ORIGAMI_DRIVER_MEM", "8g"))
        # local[N] pinned under `taskset` still leaves the JVM sizing
        # its GC/JIT/fork-join pools from the HOST's cpu count (32) —
        # at a 2-core scaling leg ~23 ParallelGCThreads thrash the two
        # pinned cpus and add run-to-run variance.  A real cluster
        # executor knows its core count; tell the local JVM the same.
        .config("spark.driver.extraJavaOptions",
                f"-XX:ActiveProcessorCount={cores}")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
