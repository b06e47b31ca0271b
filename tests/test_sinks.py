"""JSONL export sink: size-targeted shards, lossless round-trip."""

import os

import pyspark.sql.functions as F

from origami_spark.sinks import export_jsonl

SF = "/root/testdata/sf0.001"


def test_jsonl_roundtrip_and_sharding(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text", "lang")
    out = str(tmp_path / "out")
    # tiny target -> multiple shards even on the small table
    n = export_jsonl(docs, out, target_shard_mb=1)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == n
    assert all(f.endswith(".json.gz") for f in parts)

    back = spark.read.json(out)
    assert back.count() == docs.count()
    a = docs.select(F.md5(F.concat_ws("\x01", "doc_id", "text", "lang")).alias("h"))
    b = back.select(
        F.md5(F.concat_ws("\x01",
                          F.col("doc_id").cast("string"), "text", "lang")).alias("h"))
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_jsonl_single_shard_for_tiny_input(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, t string")
    out = str(tmp_path / "tiny")
    assert export_jsonl(df, out, target_shard_mb=256) == 1
    assert spark.read.json(out).count() == 2
